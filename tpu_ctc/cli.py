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
        data, _ = _synthetic_audio_data(cfg, args.synthetic_audio)
    elif args.synthetic:
        data, _ = _synthetic_data(cfg, args.synthetic)
    else:
        from tpu_ctc.data.manifest import load_manifest_dataset
        data = load_manifest_dataset(args.data, cfg)
    n_eval = max(len(data) // 10, 1)
    state, metrics = train(cfg, data[n_eval:], eval_data=data[:n_eval],
                           work_dir=args.work_dir, resume=args.resume)
    print("final metrics:", metrics)
    return 0


def cmd_decode(args):
    import jax

    from tpu_ctc.data.alphabet import DEFAULT_ALPHABET
    from tpu_ctc.data.bucketing import BucketedLoader
    from tpu_ctc.decode.wer import cer
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
        from tpu_ctc.data.manifest import load_manifest_dataset
        data = load_manifest_dataset(args.data, cfg)

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
    refs, hyps = [], []
    if args.beam:
        from tpu_ctc.decode.beam import make_beam_decoder
        from tpu_ctc.decode.lm import train_char_lm_from_data
        lm = (train_char_lm_from_data(data, cfg) if cfg.decode.lm_order
              else None)
        decode_fn = make_beam_decoder(cfg, lm=lm)
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
                    refs.append(list(batch.labels[b][:batch.label_lengths[b]]))
                    hyps.append(list(hyp[b][:hyp_len[b]]))
    print(f"decoded {len(hyps)} utterances  CER={cer(refs, hyps):.4f}")
    for r, h in list(zip(refs, hyps))[:5]:
        print("  ref:", alphabet.decode(r))
        print("  hyp:", alphabet.decode(h))
    return 0


def cmd_print_config(args):
    cfg = _load_config(args)
    print(cfg.to_json(indent=2))
    return 0


def main(argv=None):
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
    d.set_defaults(fn=cmd_decode)

    pc = sub.add_parser("print-config", parents=[common])
    pc.set_defaults(fn=cmd_print_config)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
