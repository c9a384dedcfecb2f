"""CLI drivers — the ``runNNet.py`` / ``runDecode.py`` equivalents.

Reference (SURVEY.md C14): optparse flag parsing, model construction,
train/eval dispatch, weight pickling.  Here: a thin argparse layer over the
dataclass config tree (named presets + dotted-path overrides), dispatching
to the train loop or the decoders.

Usage:
  python -m tpu_ctc.cli train --config 1 --set model.hidden_dim=256 \
      --synthetic 512 --work-dir runs/demo
  python -m tpu_ctc.cli decode --config 4 --checkpoint runs/demo/checkpoints \
      --synthetic 64 --beam
  python -m tpu_ctc.cli print-config --config 3
"""
from __future__ import annotations

import argparse
import ast
import sys

import numpy as np


def _parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def _load_config(args):
    from tpu_ctc.config import get_config
    return get_config(args.config, **_parse_overrides(args.set))


def _synthetic_data(cfg, n):
    from tpu_ctc.data.synthetic import SyntheticCorpus
    corpus = SyntheticCorpus(num_utterances=n,
                             feature_dim=cfg.model.input_dim,
                             frames_per_char=8)
    return corpus.all_utterances(), corpus.alphabet


def _synthetic_audio_data(cfg, n, seconds=4.0):
    """Tone-per-character waveforms through the real frontend."""
    import functools

    import jax
    import jax.numpy as jnp

    from tpu_ctc.data.alphabet import DEFAULT_ALPHABET
    from tpu_ctc.data.synthetic import synthetic_audio_batch
    from tpu_ctc.frontend import features as F

    fe = cfg.frontend
    # jit the whole frontend (eager per-op dispatch is pathologically slow
    # on remote-compile backends) and run it on the HOST CPU backend: data
    # prep must not occupy — or wait on — the accelerator.
    cpu = jax.local_devices(backend="cpu")[0]
    extract = jax.jit(functools.partial(F.extract_features, cfg=fe))
    data = []
    bs = 32
    with jax.default_device(cpu):
        for start in range(0, n, bs):
            b = min(bs, n - start)
            audio, sl, labels, ll = synthetic_audio_batch(
                b, int(seconds * fe.sample_rate), sample_rate=fe.sample_rate,
                seed=start)
            if b < bs:  # keep one jit shape
                pad = bs - b
                audio = np.pad(audio, ((0, pad), (0, 0)))
                sl = np.pad(sl, (0, pad))
            feats, mask = extract(jnp.asarray(audio),
                                  sample_lengths=jnp.asarray(sl))
            feats = np.asarray(feats[:b])
            nf = np.asarray(mask[:b]).sum(axis=1).astype(np.int32)
            for i in range(b):
                data.append((feats[i, :nf[i]], labels[i, :ll[i]]))
    return data, DEFAULT_ALPHABET


def cmd_train(args):
    from tpu_ctc.train.loop import train
    cfg = _load_config(args)
    if getattr(args, "synthetic_audio", 0):
        data, alphabet = _synthetic_audio_data(cfg, args.synthetic_audio)
    elif args.synthetic:
        data, alphabet = _synthetic_data(cfg, args.synthetic)
    else:
        from tpu_ctc.data.manifest import ManifestDataset
        data = ManifestDataset(args.data, cfg)  # lazy: payloads stream per batch
        alphabet = data.alphabet
    n_eval = max(len(data) // 10, 1)
    state, metrics = train(cfg, data[n_eval:], eval_data=data[:n_eval],
                           work_dir=args.work_dir, resume=args.resume,
                           alphabet=alphabet)
    print("final metrics:", metrics)
    return 0


def _utt_ids(data):
    """Utterance-id per dataset index (manifest ids when available)."""
    records = getattr(data, "records", None)
    if records is not None:
        return [r["id"] for r in records]
    return [f"utt{i:05d}" for i in range(len(data))]


def cmd_decode(args):
    """Eval job: decode → CER/WER (+ optional trn emission for rescoring).

    The reference's eval path dumped hyps and shelled out to sclite
    (SURVEY.md C13, §3.3); here one command goes from checkpoint to
    corpus WER with sub/ins/del, and ``--hyp-out`` writes ref.trn/hyp.trn
    for offline scoring with ``tools/score.py`` / ``cli score``.
    """
    import os

    from tpu_ctc.data.alphabet import DEFAULT_ALPHABET
    from tpu_ctc.data.bucketing import BucketedLoader
    from tpu_ctc.decode.wer import format_score_line, score_corpus, write_trn
    from tpu_ctc.parallel.mesh import make_mesh
    from tpu_ctc.train import checkpoint as ckpt_lib
    from tpu_ctc.train.loop import batch_to_device_dict
    from tpu_ctc.train.step import create_train_state

    cfg = _load_config(args)
    alphabet = DEFAULT_ALPHABET
    if getattr(args, "synthetic_audio", 0):
        data, alphabet = _synthetic_audio_data(cfg, args.synthetic_audio)
    elif args.synthetic:
        data, alphabet = _synthetic_data(cfg, args.synthetic)
    else:
        from tpu_ctc.data.manifest import ManifestDataset
        data = ManifestDataset(args.data, cfg, split=args.split)

    state = create_train_state(cfg)
    if args.checkpoint:
        mgr = ckpt_lib.make_manager(args.checkpoint)
        restored = ckpt_lib.restore(mgr, state)
        if restored is None:
            print(f"no checkpoint found in {args.checkpoint}", file=sys.stderr)
            return 1
        state = restored[0]

    mesh = make_mesh(cfg.mesh)
    loader = BucketedLoader(data, cfg.data)
    ids = _utt_ids(data)
    ref_texts, hyp_texts = {}, {}
    if args.beam:
        from tpu_ctc.decode.beam import make_beam_decoder
        from tpu_ctc.decode.lm import train_char_lm_from_data
        # The LM trains on the TRAIN split's transcripts, never on the
        # split being decoded (matches the papers' protocol).
        lm_data = data
        if not args.synthetic and not getattr(args, "synthetic_audio", 0) \
                and args.split != "train":
            from tpu_ctc.data.manifest import ManifestDataset
            lm_data = ManifestDataset(args.data, cfg, split="train")
        lm = (train_char_lm_from_data(lm_data, cfg) if cfg.decode.lm_order
              else None)
        nlm_params = None
        if getattr(cfg.decode, "neural_lm", False):
            from tpu_ctc.decode.neural_lm import train_nlm_from_data
            nlm_params = train_nlm_from_data(lm_data, cfg)
        decode_fn = make_beam_decoder(cfg, lm=lm, nlm_params=nlm_params)
    else:
        decode_fn = None

    from tpu_ctc.train.step import make_eval_step
    eval_step = make_eval_step(cfg, mesh)
    with mesh:
        for _, batch in loader.epoch(0):
            bd = batch_to_device_dict(batch)
            if decode_fn is not None:
                hyp, hyp_len = decode_fn(state.params, bd)
            else:
                out = eval_step(state.params, bd)
                hyp, hyp_len = out["hyp"], out["hyp_len"]
            hyp, hyp_len = np.asarray(hyp), np.asarray(hyp_len)
            for b in range(len(hyp)):
                if batch.weights[b] > 0:
                    utt = ids[int(batch.utt_indices[b])]
                    ref_texts[utt] = alphabet.decode(
                        batch.labels[b][:batch.label_lengths[b]])
                    hyp_texts[utt] = alphabet.decode(hyp[b][:hyp_len[b]])

    wer_totals, _ = score_corpus(ref_texts, hyp_texts, "word")
    cer_totals, _ = score_corpus(ref_texts, hyp_texts, "char")
    print(f"decoded {len(hyp_texts)} utterances")
    print(format_score_line(wer_totals, "word"))
    print(format_score_line(cer_totals, "char"))
    for utt in sorted(ref_texts)[:5]:
        print("  ref:", ref_texts[utt])
        print("  hyp:", hyp_texts[utt])
    if args.hyp_out:
        os.makedirs(args.hyp_out, exist_ok=True)
        write_trn(os.path.join(args.hyp_out, "ref.trn"), ref_texts)
        write_trn(os.path.join(args.hyp_out, "hyp.trn"), hyp_texts)
        print(f"wrote {args.hyp_out}/ref.trn and hyp.trn")
    return 0


def cmd_score(args):
    from tpu_ctc.decode.wer import (bootstrap_ci, format_score_line,
                                    parse_trn, score_corpus)
    refs = parse_trn(args.ref)
    hyps = parse_trn(args.hyp)
    for unit in (["word", "char"] if args.unit == "both" else [args.unit]):
        totals, _ = score_corpus(refs, hyps, unit)
        line = format_score_line(totals, unit)
        if getattr(args, "ci", False):
            lo, hi = bootstrap_ci(refs, hyps, unit)
            line += f"  95% CI [{100*lo:.2f}, {100*hi:.2f}]"
        print(line)
    return 0


def cmd_export_weights(args):
    """Export checkpoint params as a flat .npz (reference parity: the
    ``writeNumpyWeights`` snapshot the decode drivers consumed)."""
    from tpu_ctc.train import checkpoint as ckpt_lib
    from tpu_ctc.train.step import create_train_state

    cfg = _load_config(args)
    state = create_train_state(cfg)
    mgr = ckpt_lib.make_manager(args.checkpoint)
    restored = ckpt_lib.restore(mgr, state)
    if restored is None:
        print(f"no checkpoint found in {args.checkpoint}", file=sys.stderr)
        return 1
    n = ckpt_lib.export_npz(args.out, restored[0].params)
    print(f"wrote {n} arrays to {args.out} "
          f"(step {int(restored[0].step)})")
    return 0


def cmd_print_config(args):
    cfg = _load_config(args)
    print(cfg.to_json(indent=2))
    return 0


def main(argv=None):
    # Respect an explicit JAX_PLATFORMS=cpu even on hosts whose
    # sitecustomize force-registers an accelerator plugin and overrides
    # the env var at interpreter start (same gate as __graft_entry__ /
    # tests/conftest.py): a CLI run the user pinned to CPU must never
    # contend for the TPU claim.
    import os
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(prog="tpu_ctc")
    sub = p.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--config", default="default",
                        help="preset name or ordinal 1-5")
    common.add_argument("--set", action="append", metavar="PATH=VAL",
                        help="dotted-path config override")
    common.add_argument("--synthetic", type=int, default=0,
                        help="use N synthetic utterances instead of --data")
    common.add_argument("--synthetic-audio", type=int, default=0,
                        help="use N synthetic tone-waveform utterances "
                             "through the real frontend")
    common.add_argument("--data", help="manifest directory")

    t = sub.add_parser("train", parents=[common])
    t.add_argument("--work-dir", default=".")
    t.add_argument("--resume", action="store_true")
    t.set_defaults(fn=cmd_train)

    d = sub.add_parser("decode", parents=[common])
    d.add_argument("--checkpoint")
    d.add_argument("--beam", action="store_true",
                   help="prefix beam search instead of greedy")
    d.add_argument("--hyp-out", default=None,
                   help="directory to write ref.trn/hyp.trn for scoring")
    d.add_argument("--split", default="train",
                   help="manifest split to decode (e.g. valid)")
    d.set_defaults(fn=cmd_decode)

    sc = sub.add_parser("score")
    sc.add_argument("--ref", required=True)
    sc.add_argument("--hyp", required=True)
    sc.add_argument("--unit", choices=["word", "char", "both"], default="both")
    sc.add_argument("--ci", action="store_true",
                    help="bootstrap 95%% CI (utterance resampling)")
    sc.set_defaults(fn=cmd_score)

    ew = sub.add_parser("export-weights", parents=[common])
    ew.add_argument("--checkpoint", required=True)
    ew.add_argument("--out", required=True, help=".npz output path")
    ew.set_defaults(fn=cmd_export_weights)

    pc = sub.add_parser("print-config", parents=[common])
    pc.set_defaults(fn=cmd_print_config)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
