"""Pallas TPU kernels for the fused BiRNN recurrence.

BASELINE north_star: "cudamat RNN kernels become XLA scan/Pallas fused BiRNN
layers".  Reference shape of the computation: SURVEY.md C4 / §3.1 — the
per-layer recurrences  f_t = act(z_t + Wf f_{t-1}),  b_t = act(z_t + Wb
b_{t+1})  that the reference ran as an interpreted Python loop over cudamat
matmuls ("inner HOT LOOP, Python-interpreted per step").

Division of labor with XLA (same doctrine as :mod:`tpu_ctc.ops.ctc_pallas`):

  * The **kernels** implement only the intrinsically sequential sweeps.
    Forward:  h_t = clip(z_t + h_{t-1} @ W) masked by frame length — one
    [Bb, H] x [H, H] MXU matmul + VPU clip per step, with the carry living
    in VMEM scratch across time-chunks of the same batch block and W
    VMEM-resident for the whole sweep (the XLA `lax.scan` version re-enters
    the HLO while-loop body every step, which is latency-bound at these
    sizes).  Backward: the delta recursion
        d_t = (g_t + d_next @ W^T) * 1{0 < h_t < clip}
    — the hand-derived backprop the reference wrote by hand (SURVEY.md C4
    "backprop hand-written"), here as the custom VJP of the fused op.

  * **XLA** handles everything embarrassingly parallel around them: the
    shared input projection z = x @ W_in + bias (a [B*T, D] MXU matmul,
    outside the op), the weight gradients dW = sum_t h_{t-1}^T d_t (one big
    [H, T*B] x [T*B, H] matmul over the stored states), and dz = d^f + d^b
    flowing into the projection's autodiff.

Data layout is time-major [T, B, H] inside the op (one XLA transpose each
way at the boundary) so each per-step slab read/write is a contiguous
untiled first-dim index.  Streams (z, h, g, d) use the model's compute
dtype (bfloat16 by default) to halve HBM traffic; the recurrence carry and
all matmul accumulations stay float32, so rounding does not compound across
time steps.

Frame masking is length-based: the kernel zeroes h_t for t >= length, which
for the framework's trailing-padding masks is exactly the scan path's
`h * mask` semantics (padded rows freeze at zero in both directions).

On non-TPU backends the kernels run in Pallas interpret mode (CI-testable
on CPU); :func:`supported` additionally gates widths whose weight matrix
does not fit the VMEM budget (those fall back to the XLA scan).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e has 128 MB of VMEM; Mosaic's scoped limit defaults to 16 MB, so the
# kernels raise it explicitly (CompilerParams) and budget ~80 MB for W +
# carry + the double-buffered stream chunks, leaving headroom for Mosaic's
# own allocations.
_VMEM_BUDGET = 80 * 1024 * 1024
_VMEM_LIMIT = 110 * 1024 * 1024
_MAX_TC = 16   # cap time-chunk: T pads to a multiple of tc (wasted frames),
               # and bucket lengths are multiples of 16; tc=16 beat tc=8/24/32
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(hidden_dim: int, compute_dtype, io_dtype=None) -> bool:
    """Whether the fused kernel applies: W (plus one stream chunk at the
    minimum Tc) must fit the VMEM budget.  The stream buffers live in the
    *io* dtype (``birnn_io_dtype``), which may be wider than the compute
    dtype — budget them at their real itemsize."""
    h_pad = _round_up(hidden_dim, _LANE)
    item = jnp.dtype(compute_dtype).itemsize
    s_item = jnp.dtype(io_dtype or compute_dtype).itemsize
    w_bytes = h_pad * h_pad * item
    min_stream = 3 * 2 * 8 * 16 * h_pad * s_item  # 3 streams, 2 bufs, Tc=8, Bb=16
    return w_bytes + min_stream + 4 * h_pad * 16 <= _VMEM_BUDGET


def _plan(b_pad: int, h_pad: int, w_item: int, s_item: int, streams: int):
    """Pick (Bb, Tc): batch rows per block and time steps per chunk so that
    W + carry + `streams` double-buffered [Tc, Bb, H] chunks fit the budget."""
    w_bytes = h_pad * h_pad * w_item
    for bb in (128, 64, 32, 16):
        if b_pad % bb:
            continue
        left = _VMEM_BUDGET - w_bytes - 4 * bb * h_pad  # minus f32 carry
        tc = left // (2 * streams * bb * h_pad * s_item)
        tc = min(_MAX_TC, (tc // 8) * 8)
        if tc >= 8:
            return bb, tc
    return 8, 8


# ---------------------------------------------------------------------------
# Forward sweep:  h_t = clip(z_t + h_prev @ W) * 1{t < length}
# ---------------------------------------------------------------------------

def _fwd_kernel(z_ref, w_ref, len_ref, h0_ref, h_out_ref, carry, *,
                reverse: bool, clip: float, tc: int, t_true: int):
    ti = pl.program_id(1)
    nt = pl.num_programs(1)
    length = len_ref[:, 0:1]                       # [Bb, 1] f32

    @pl.when(ti == 0)
    def _():
        carry[:, :] = h0_ref[:, :].astype(jnp.float32)

    def body(j, h):
        i = tc - 1 - j if reverse else j
        t = ((nt - 1 - ti) * tc + i) if reverse else (ti * tc + i)
        a = z_ref[i].astype(jnp.float32) + jnp.dot(
            h.astype(w_ref.dtype), w_ref[:, :],
            preferred_element_type=jnp.float32)
        h_new = jnp.where(t * 1.0 < length, jnp.clip(a, 0.0, clip), 0.0)
        # Frames in [t_true, t_pad) exist only because T was padded to the
        # chunk size: the carry passes through untouched — the reverse
        # sweep ENTERS through this region and must reach the last real
        # frame with h0 intact.  Statically elided when T is chunk-aligned
        # (every bucketed shape), where it would be a per-step no-op.
        if t_true < nt * tc:
            h_new = jnp.where(t >= t_true, h, h_new)
        h_out_ref[i] = h_new.astype(h_out_ref.dtype)
        return h_new

    carry[:, :] = jax.lax.fori_loop(0, tc, body, carry[:, :])


def _run_fwd(z, w, lengths, h0, *, reverse: bool, clip: float,
             bb: int, tc: int, t_true: int):
    """z [T,B,H], w [H,H], lengths [B,128] f32, h0 [B,H] (initial carry:
    h_{-1} fwd / h_T reversed) -> h [T,B,H] (z.dtype).  t_true is the
    unpadded T: frames beyond it are carry passthrough."""
    t, b, h = z.shape
    nt = t // tc
    idx = (lambda bi, ti: (nt - 1 - ti, bi, 0)) if reverse \
        else (lambda bi, ti: (ti, bi, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, reverse=reverse, clip=clip, tc=tc,
                          t_true=t_true),
        grid=(b // bb, nt),
        in_specs=[
            pl.BlockSpec((tc, bb, h), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, _LANE), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, bb, h), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, h), z.dtype),
        scratch_shapes=[pltpu.VMEM((bb, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(z, w, lengths, h0)


# ---------------------------------------------------------------------------
# Backward sweep:  d_t = (g_t + d_next @ W^T) * 1{0 < h_t < clip}
# ---------------------------------------------------------------------------

def _bwd_kernel(g_ref, hs_ref, wt_ref, d_out_ref, carry, *,
                reverse: bool, clip: float, tc: int, t_true: int):
    ti = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(ti == 0)
    def _():
        carry[:, :] = jnp.zeros_like(carry[:, :])

    def body(j, d):
        i = tc - 1 - j if reverse else j
        t = ((nt - 1 - ti) * tc + i) if reverse else (ti * tc + i)
        hs_i = hs_ref[i].astype(jnp.float32)  # Mosaic: no bf16 compares
        active = (hs_i > 0.0) & (hs_i < clip)
        d_tot = g_ref[i].astype(jnp.float32) + jnp.dot(
            d.astype(wt_ref.dtype), wt_ref[:, :],
            preferred_element_type=jnp.float32)
        d_new = jnp.where(active, d_tot, 0.0)
        # Padded frames [t_true, t_pad) are identity in the primal (carry
        # passthrough), so their cotangent passes through unchanged — and
        # contributes nothing to dz/dW (zero written out).  Statically
        # elided for chunk-aligned T.
        if t_true < nt * tc:
            d_new = jnp.where(t >= t_true, d, d_new)
            d_out_ref[i] = jnp.where(t >= t_true, 0.0,
                                     d_new).astype(d_out_ref.dtype)
        else:
            d_out_ref[i] = d_new.astype(d_out_ref.dtype)
        return d_new

    carry[:, :] = jax.lax.fori_loop(0, tc, body, carry[:, :])


def _run_bwd(g, hs, wt, *, reverse: bool, clip: float, bb: int, tc: int,
             t_true: int):
    t, b, h = g.shape
    nt = t // tc
    idx = (lambda bi, ti: (nt - 1 - ti, bi, 0)) if reverse \
        else (lambda bi, ti: (ti, bi, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, reverse=reverse, clip=clip, tc=tc,
                          t_true=t_true),
        grid=(b // bb, nt),
        in_specs=[
            pl.BlockSpec((tc, bb, h), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, bb, h), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, bb, h), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, h), g.dtype),
        scratch_shapes=[pltpu.VMEM((bb, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(g, hs, wt)


# ---------------------------------------------------------------------------
# custom-VJP fused bidirectional recurrence
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_bi_recurrence(clip: float, cdt_name: str, io_name: str,
                        time_major: bool, bidirectional: bool = True):
    cdt = jnp.dtype(cdt_name)      # matmul-input dtype (MXU)
    io = jnp.dtype(io_name)        # HBM stream dtype for z/h/g/delta
    # time_major: z/out are [T, B, H] (no boundary transposes — the layout
    # the kernels want); otherwise [B, T, H] with one moveaxis each way.
    # bidirectional=False is the reference's earlier-gen unidirectional
    # family (rnn/rnnet.py): wb is ignored and gets a zero cotangent.

    def _pad_shapes(dims):
        """(b_pad, t_pad, h_pad, bb, tc) — one plan (3-stream worst case,
        the backward sweep) shared by both kernels so buffers line up."""
        b, t, h = dims
        b_pad = _round_up(b, 16)
        h_pad = _round_up(h, _LANE)
        bb, tc = _plan(b_pad, h_pad, cdt.itemsize, io.itemsize, streams=3)
        tc = min(tc, _round_up(t, 8))
        return b_pad, _round_up(t, tc), h_pad, bb, tc

    def _dims(x):
        """Logical (b, t, h) of a layout-dependent array."""
        return (x.shape[1], x.shape[0], x.shape[2]) if time_major else x.shape

    def _prep(z, lengths):
        """Input stream -> time-major padded [T',B',H'] + length tile."""
        b, t, h = _dims(z)
        b_pad, t_pad, h_pad = _pad_shapes((b, t, h))[:3]
        if time_major:
            z_t = jnp.pad(z, ((0, t_pad - t), (0, b_pad - b),
                              (0, h_pad - h))).astype(io)
        else:
            zp = jnp.pad(z, ((0, b_pad - b), (0, t_pad - t), (0, h_pad - h)))
            z_t = jnp.moveaxis(zp, 1, 0).astype(io)
        len_tile = jnp.broadcast_to(
            jnp.pad(lengths.astype(jnp.float32), (0, b_pad - b))[:, None],
            (b_pad, _LANE))
        return z_t, len_tile

    def _pad_w(w, h_pad):
        h = w.shape[0]
        return jnp.pad(w, ((0, h_pad - h), (0, h_pad - h))).astype(cdt)

    @jax.custom_vjp
    def bi_recurrence(z, wf, wb, lengths):
        return _fwd(z, wf, wb, lengths)[0]

    def _fwd(z, wf, wb, lengths):
        b, t, h = _dims(z)
        _, _, h_pad, bb, tc = _pad_shapes((b, t, h))
        z_t, len_tile = _prep(z, lengths)
        zero_h0 = jnp.zeros(z_t.shape[1:], io)
        hs_f = _run_fwd(z_t, _pad_w(wf, h_pad), len_tile, zero_h0,
                        reverse=False, clip=clip, bb=bb, tc=tc, t_true=t)
        out = hs_f[:t, :b, :h].astype(jnp.float32)
        hs_b = None
        if bidirectional:
            hs_b = _run_fwd(z_t, _pad_w(wb, h_pad), len_tile, zero_h0,
                            reverse=True, clip=clip, bb=bb, tc=tc,
                            t_true=t)
            out = out + hs_b[:t, :b, :h].astype(jnp.float32)
        if not time_major:
            out = jnp.moveaxis(out, 0, 1)
        return out, (hs_f, hs_b, wf, wb, (b, t, h))

    def _bwd(res, g):
        hs_f, hs_b, wf, wb, (b, t, h) = res
        t_pad, b_pad, h_pad = hs_f.shape
        g_t = g if time_major else jnp.moveaxis(g, 1, 0)
        gp = jnp.pad(g_t, ((0, t_pad - t), (0, b_pad - b), (0, h_pad - h))
                     ).astype(io)
        bb, tc = _pad_shapes((b, t, h))[3:]
        # The forward-direction recurrence backpropagates right-to-left,
        # the backward-direction one left-to-right.
        d_f = _run_bwd(gp, hs_f, _pad_w(wf, h_pad).T, reverse=True,
                       clip=clip, bb=bb, tc=tc, t_true=t)
        dz = d_f[:t, :b, :h].astype(jnp.float32)
        # dW = sum_t h_neighbour^T d_t — one big MXU matmul over T*B rows.
        zeros = jnp.zeros((1,) + hs_f.shape[1:], hs_f.dtype)
        h_prev_f = jnp.concatenate([zeros, hs_f[:-1]], axis=0)
        dwf = jnp.einsum("tbh,tbk->hk", h_prev_f, d_f,
                         preferred_element_type=jnp.float32)[:h, :h]
        if bidirectional:
            d_b = _run_bwd(gp, hs_b, _pad_w(wb, h_pad).T, reverse=False,
                           clip=clip, bb=bb, tc=tc, t_true=t)
            dz = dz + d_b[:t, :b, :h].astype(jnp.float32)
            h_next_b = jnp.concatenate([hs_b[1:], zeros], axis=0)
            dwb = jnp.einsum("tbh,tbk->hk", h_next_b, d_b,
                             preferred_element_type=jnp.float32)[:h, :h]
            dwb = dwb.astype(wb.dtype)
        else:
            dwb = jnp.zeros_like(wb)
        if not time_major:
            dz = jnp.moveaxis(dz, 0, 1)
        return (dz, dwf.astype(wf.dtype), dwb,
                jnp.zeros((b,), jnp.float32))

    bi_recurrence.defvjp(_fwd, _bwd)
    return bi_recurrence


def bi_recurrence(z: jnp.ndarray, wf: jnp.ndarray, wb: jnp.ndarray,
                  mask: jnp.ndarray, *, clip: float, compute_dtype,
                  io_dtype=None, time_major: bool = False,
                  bidirectional: bool = True) -> jnp.ndarray:
    """Fused bidirectional clipped-ReLU recurrence.

    z [B, T, H] float32 (shared input projection; [T, B, H] when
    ``time_major``), wf/wb [H, H], mask [B, T] with trailing padding ->
    f + b summed hidden sequences in z's layout, float32.  Same contract as
    summing two :func:`tpu_ctc.models.birnn._recurrence` calls.  With
    ``bidirectional=False`` only the forward sweep runs (wb ignored, zero
    cotangent) — the reference's earlier-gen unidirectional family.
    """
    lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
    fn = _make_bi_recurrence(float(clip), jnp.dtype(compute_dtype).name,
                             jnp.dtype(io_dtype or compute_dtype).name,
                             bool(time_major), bool(bidirectional))
    return fn(z.astype(jnp.float32), wf, wb, lengths)


# ---------------------------------------------------------------------------
# Single-direction recurrence from a nonzero carry (sequence parallelism)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_carry_recurrence(clip: float, cdt_name: str, io_name: str,
                           reverse: bool):
    """custom-VJP single-direction sweep h_t = clip(z_t + h_prev @ W) from
    carry h0 — the chunk-local recurrence of the SP carry ring (SURVEY P4).
    Batch-major: z [B, T, H], h0 [B, H]."""
    cdt = jnp.dtype(cdt_name)
    io = jnp.dtype(io_name)

    def _shapes(b, t, h):
        b_pad = _round_up(b, 16)
        h_pad = _round_up(h, _LANE)
        bb, tc = _plan(b_pad, h_pad, cdt.itemsize, io.itemsize, streams=3)
        tc = min(tc, _round_up(t, 8))
        return b_pad, _round_up(t, tc), h_pad, bb, tc

    @jax.custom_vjp
    def rec(z, w, h0, lengths):
        return _fwd(z, w, h0, lengths)[0]

    def _fwd(z, w, h0, lengths):
        b, t, h = z.shape
        b_pad, t_pad, h_pad, bb, tc = _shapes(b, t, h)
        z_t = jnp.moveaxis(
            jnp.pad(z, ((0, b_pad - b), (0, t_pad - t), (0, h_pad - h))),
            1, 0).astype(io)
        h0_p = jnp.pad(h0, ((0, b_pad - b), (0, h_pad - h))).astype(io)
        len_tile = jnp.broadcast_to(
            jnp.pad(lengths.astype(jnp.float32), (0, b_pad - b))[:, None],
            (b_pad, _LANE))
        w_p = jnp.pad(w, ((0, h_pad - h), (0, h_pad - h))).astype(cdt)
        hs = _run_fwd(z_t, w_p, len_tile, h0_p, reverse=reverse, clip=clip,
                      bb=bb, tc=tc, t_true=t)
        out = jnp.moveaxis(hs[:t, :b, :h].astype(jnp.float32), 0, 1)
        return out, (hs, h0_p, w, (b, t, h))

    def _bwd(res, g):
        hs, h0_p, w, (b, t, h) = res
        t_pad, b_pad, h_pad = hs.shape
        bb, tc = _shapes(b, t, h)[3:]
        gp = jnp.pad(jnp.moveaxis(g, 1, 0),
                     ((0, t_pad - t), (0, b_pad - b), (0, h_pad - h))
                     ).astype(io)
        w_p = jnp.pad(w, ((0, h_pad - h), (0, h_pad - h))).astype(cdt)
        # The delta recursion runs in the opposite time order of the sweep.
        d = _run_bwd(gp, hs, w_p.T, reverse=not reverse, clip=clip,
                     bb=bb, tc=tc, t_true=t)
        dz = jnp.moveaxis(d[:t, :b, :h].astype(jnp.float32), 0, 1)
        # Neighbour states: h0 sits at the sweep's first processed frame.
        h0_row = h0_p[None].astype(hs.dtype)
        if reverse:
            h_nb = jnp.concatenate([hs[1:], h0_row], axis=0)
            d_first = d[t - 1]
        else:
            h_nb = jnp.concatenate([h0_row, hs[:-1]], axis=0)
            d_first = d[0]
        dw = jnp.einsum("tbh,tbk->hk", h_nb, d,
                        preferred_element_type=jnp.float32)[:h, :h]
        dh0 = jnp.dot(d_first.astype(cdt), w_p.T,
                      preferred_element_type=jnp.float32)[:b, :h]
        return (dz, dw.astype(w.dtype), dh0, jnp.zeros((b,), jnp.float32))

    rec.defvjp(_fwd, _bwd)
    return rec


def carry_recurrence(z: jnp.ndarray, w: jnp.ndarray, h0: jnp.ndarray,
                     mask: jnp.ndarray, *, reverse: bool, clip: float,
                     compute_dtype, io_dtype=None) -> jnp.ndarray:
    """Single-direction clipped-ReLU recurrence from carry h0.

    z [B, T, H] f32, w [H, H], h0 [B, H], mask [B, T] trailing-padded ->
    hs [B, T, H] f32.  Same contract as
    :func:`tpu_ctc.models.birnn._recurrence_with_carry` (whose h_last is
    hs[:, -1] fwd / hs[:, 0] reversed)."""
    lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
    fn = _make_carry_recurrence(float(clip), jnp.dtype(compute_dtype).name,
                                jnp.dtype(io_dtype or compute_dtype).name,
                                bool(reverse))
    return fn(z.astype(jnp.float32), w, h0.astype(jnp.float32), lengths)
