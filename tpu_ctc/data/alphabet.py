"""Character alphabet for lexicon-free CTC (blank id 0).

The reference's corpus pipelines exported a char alphabet map with blank=0
(SURVEY.md §3.4: "char transcript mapping (alphabet file, blank id 0)").
Here the alphabet is a first-class object usable both host-side (encode /
decode strings) and device-side (the integer ids are the model's classes).
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Sequence

BLANK_ID = 0
BLANK_SYMBOL = "<b>"

# Default lexicon-free English character set (matches the papers' setup:
# letters, space, apostrophe; CTC blank at 0).
DEFAULT_CHARS = " 'abcdefghijklmnopqrstuvwxyz"


class Alphabet:
    def __init__(self, chars: str = DEFAULT_CHARS):
        if len(set(chars)) != len(chars):
            raise ValueError("duplicate characters in alphabet")
        self.chars = chars
        self._to_id: Dict[str, int] = {c: i + 1 for i, c in enumerate(chars)}
        self._to_char: Dict[int, str] = {i + 1: c for i, c in enumerate(chars)}

    @property
    def size(self) -> int:
        """Number of model classes, including the blank."""
        return len(self.chars) + 1

    @property
    def blank(self) -> int:
        return BLANK_ID

    def encode(self, text: str) -> List[int]:
        text = text.lower()
        return [self._to_id[c] for c in text if c in self._to_id]

    def decode(self, ids: Sequence[int]) -> str:
        return "".join(self._to_char.get(int(i), "") for i in ids)

    def decode_batch(self, ids, lengths) -> List[str]:
        return [self.decode(row[:int(n)]) for row, n in zip(ids, lengths)]

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(BLANK_SYMBOL + "\n")
            for c in self.chars:
                f.write((c if c != " " else "<sp>") + "\n")

    @classmethod
    def load(cls, path: str) -> "Alphabet":
        with open(path) as f:
            lines = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
        if lines[0] != BLANK_SYMBOL:
            raise ValueError("alphabet file must start with the blank symbol")
        chars = "".join(" " if tok == "<sp>" else tok for tok in lines[1:])
        return cls(chars)


DEFAULT_ALPHABET = Alphabet()
