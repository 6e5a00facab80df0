"""Pallas small-channel KxK convolution via tap-packed MXU matmuls (streamed).

The OutHead image path convolves 224² maps at 32 channels with 5×5 kernels and
112² maps at 64 channels with 3×3 kernels (reference ``out.py:39-44,59-66``).
XLA lowers these as one matmul per tap with K = N = C_in ≤ 64, wasting ≥3/4 of
every 128-lane MXU pass (measured ~7% MFU on the 224²×32ch instance). Here the
convolution is Σ_taps shift(x)·W[tap] with taps PACKED along the contraction
dim so MXU passes run full:

    acc += [shift_1(x) | … | shift_g(x)] @ [W_1; …; W_g]     (K = g·C_in ≤ 128)

⇒ ~k²·cin/128× fewer MXU tile-ops than XLA's per-tap lowering.

**Layout strategy** (what Mosaic accepts AND runs fast — several failed
formulations preceded this one, see PERF_NOTES round 3):

- the map is H-padded on the host (contiguous rows — cheap; XLA's *interior*
  W-pads and lane-concat packing fusions measured ~2 ms/call at these shapes)
  and flattened to (B, Hp·W, cin) so h-shifts are aligned sublane slices.
- w-shifts are built IN KERNEL with :func:`pltpu.roll` on the row-block window
  (result carries an offset-0 layout, so the subsequent lane-concat is legal;
  directly lane-concatenating sublane-offset slices is rejected by Mosaic:
  "result/input offset mismatch on non-concat dimension"), with the wrapped
  columns zeroed via an iota-mod mask — zero taps contribute zero, exactly as
  SAME zero-padding would.
- the grid is (batch, row-blocks) with ~7 small dots per program — whole-image
  unrolled bodies blow Mosaic's compile time past 25 min.

Custom VJP, one fused backward kernel per row-block:
  - dx: the same tap-packed structure on the H-padded cotangent with spatially
    flipped, in/out-swapped weights (valid because p == k//2).
  - dw: the fwd rolled windows contracted against the cotangent rows into a
    revisited fp32 accumulator block (constant out index over the whole grid —
    Mosaic keeps it in VMEM and writes it once; same trick as the
    diff-attention backward's dk/dv).

Requirements: stride 1, square odd kernel, SAME padding, C_in ∈ {8,16,32,64},
W % 8 == 0, maps fit VMEM. Exact ``lax.conv_general_dilated`` fallback
elsewhere (:func:`conv_small_c`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_96M = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _lax_conv(x, w, padding: int):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _plan(k: int, cin: int):
    """Tap grouping + dot schedule.

    chunks: [(dx0, wc)] — lane-packed runs of consecutive dx taps.
    dots:   [(chunk_idx, [dy...])] — each dot lane-concats those dy rows of its
            chunk (width = len(dys)·wc·cin ≤ 128) against a packed weight slab.
    """
    rowpack = max(1, min(128 // cin, k))
    chunks = [(dx0, min(rowpack, k - dx0)) for dx0 in range(0, k, rowpack)]
    dots = []
    for ci, (_, wc) in enumerate(chunks):
        nd = max(1, 128 // (wc * cin))
        for dy0 in range(0, k, nd):
            dots.append((ci, list(range(dy0, min(dy0 + nd, k)))))
    return chunks, dots


def _pack_weights(w, chunks, dots):
    """(k,k,cin,cout) → (ndots, 128, cout) slabs matching the dot lane order."""
    cin, cout = w.shape[2], w.shape[3]
    slabs = []
    for ci, dys in dots:
        dx0, wc = chunks[ci]
        taps = [w[dy, dx0 + j] for dy in dys for j in range(wc)]  # each (cin, cout)
        slab = jnp.concatenate(taps, axis=0)
        if slab.shape[0] < 128:
            slab = jnp.concatenate([slab, jnp.zeros((128 - slab.shape[0], cout), slab.dtype)])
        slabs.append(slab)
    return jnp.stack(slabs)


def _row_block(h: int) -> int:
    """Largest divisor of h ≤ 32, preferring multiples of 8 (sublane-aligned —
    required by the TPU routing gate; odd blocks only occur in interpret tests)."""
    for bh in (32, 24, 16, 8):
        if h % bh == 0:
            return bh
    return next(bh for bh in range(min(h, 32), 0, -1) if h % bh == 0)


def _shifted_windows(x_ref, r0, k: int, p: int, bh: int, wd: int, interpret: bool):
    """Per-dx w-shifted copies of the row-block window, wrapped columns zeroed.

    Returns rolled[dx] of shape ((bh+k-1)·wd, cin): rolled[dx][i·wd + w] =
    x_padH[r0 + i, w + dx - p] (0 where the w-index is out of range). dy-shifts
    are then free aligned value slices: tap (dy,dx) = rolled[dx][dy·wd : +bh·wd].
    """
    nwin = (bh + k - 1) * wd
    win = x_ref[0, pl.ds(r0 * wd, nwin), :]
    dtype = win.dtype
    if dtype.itemsize != 4 and not interpret:
        # Mosaic's sublane rotate only handles 32-bit data ("Rotate with
        # non-32-bit data"); rolls run in f32, dots cast back to the compute
        # dtype (the converts are cheap VPU passes; the rotate is row-wise so
        # values are bit-preserved through the round-trip)
        win = win.astype(jnp.float32)
    col = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (nwin, 1), 0), wd)
    out = []
    for dx in range(k):
        d = dx - p
        if d == 0:
            out.append(win.astype(dtype))
            continue
        # pltpu.roll requires a non-negative shift; -d ≡ nwin - d (mod nwin)
        r = jnp.roll(win, -d, axis=0) if interpret else pltpu.roll(win, (-d) % nwin, axis=0)
        valid = (col >= -d) if d < 0 else (col < wd - d)
        out.append(jnp.where(valid, r, jnp.zeros((), r.dtype)).astype(dtype))
    return out


def _packed_dots(rolled, w_ref, chunks, dots, bh: int, wd: int, cin: int, cout: int):
    n = bh * wd
    acc = jnp.zeros((n, cout), jnp.float32)
    for di, (ci, dys) in enumerate(dots):
        dx0, wc = chunks[ci]
        parts = [rolled[dx0 + j][dy * wd : dy * wd + n] for dy in dys for j in range(wc)]
        xg = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        wg = w_ref[di, : len(dys) * wc * cin]
        acc += jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return acc


def _fwd_kernel(x_ref, w_ref, o_ref, *, chunks, dots, bh: int, k: int, p: int, wd: int, interpret: bool):
    cin = x_ref.shape[2]
    cout = o_ref.shape[2]
    r0 = pl.program_id(1) * bh
    rolled = _shifted_windows(x_ref, r0, k, p, bh, wd, interpret)
    acc = _packed_dots(rolled, w_ref, chunks, dots, bh, wd, cin, cout)
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(
    x_ref, gp_ref, g_ref, wf_ref, dx_ref, dw_ref,
    *, chunks, dots, chunks_b, dots_b, bh: int, k: int, p: int, wd: int, interpret: bool,
):
    """Fused dx+dw for one row-block. x windows feed dw; cotangent windows feed dx."""
    cin = x_ref.shape[2]
    cout = gp_ref.shape[2]
    r0 = pl.program_id(1) * bh
    n = bh * wd

    # dx: tap-packed conv of the H-padded cotangent with flipped/swapped weights
    grolled = _shifted_windows(gp_ref, r0, k, p, bh, wd, interpret)
    dxa = _packed_dots(grolled, wf_ref, chunks_b, dots_b, bh, wd, cout, cin)
    dx_ref[0] = dxa.astype(dx_ref.dtype)

    # dw: the fwd shifted windows against this block's cotangent rows,
    # accumulated in a grid-constant fp32 output block
    g_rows = g_ref[0]
    rolled = _shifted_windows(x_ref, r0, k, p, bh, wd, interpret)
    slabs = []
    for ci, dys in dots:
        dx0, wc = chunks[ci]
        parts = [rolled[dx0 + j][dy * wd : dy * wd + n] for dy in dys for j in range(wc)]
        xg = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        width = len(dys) * wc * cin
        dwg = jax.lax.dot_general(xg, g_rows, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if width < 128:
            dwg = jnp.concatenate([dwg, jnp.zeros((128 - width, cout), jnp.float32)])
        slabs.append(dwg)
    dwv = jnp.stack(slabs)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[...] = dwv

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[...] += dwv


def _pad_h_flat(x, p: int):
    """H-only pad (contiguous, cheap) + flatten to (B, (H+2p)·W, C)."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    return xp.reshape(b, (h + 2 * p) * wd, c)


def _pallas_conv_fwd(x, w, padding: int, interpret: bool = False):
    b, h, wd, cin = x.shape
    k, _, _, cout = w.shape
    chunks, dots = _plan(k, cin)
    bh = _row_block(h)
    wm = _pack_weights(w, chunks, dots).astype(x.dtype)
    xf = _pad_h_flat(x, padding)
    y = pl.pallas_call(
        functools.partial(
            _fwd_kernel, chunks=chunks, dots=dots, bh=bh, k=k, p=padding, wd=wd, interpret=interpret
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * wd, cout), x.dtype),
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((1,) + xf.shape[1:], lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wm.shape, lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh * wd, cout), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        compiler_params=_VMEM_96M,
        interpret=interpret,
    )(xf, wm)
    return y.reshape(b, h, wd, cout)


def _pallas_conv_bwd(x, w, g, padding: int, interpret: bool = False):
    """Fused (dx, dw) in one kernel. Valid for SAME padding == k//2 (odd k)."""
    b, h, wd, cin = x.shape
    k, _, _, cout = w.shape
    chunks, dots = _plan(k, cin)
    chunks_b, dots_b = _plan(k, cout)
    # dx weights: spatial flip + in/out swap
    wf = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    wmb = _pack_weights(wf, chunks_b, dots_b).astype(x.dtype)
    g = g.astype(x.dtype)
    xf = _pad_h_flat(x, padding)
    gp = _pad_h_flat(g, padding)
    bh = _row_block(h)
    dx, dwp = pl.pallas_call(
        functools.partial(
            _bwd_kernel, chunks=chunks, dots=dots, chunks_b=chunks_b, dots_b=dots_b,
            bh=bh, k=k, p=padding, wd=wd, interpret=interpret,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h * wd, cin), x.dtype),
            jax.ShapeDtypeStruct((len(dots), 128, cout), jnp.float32),
        ),
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((1,) + xf.shape[1:], lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + gp.shape[1:], lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh * wd, cout), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wmb.shape, lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bh * wd, cin), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((len(dots), 128, cout), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=_VMEM_96M,
        interpret=interpret,
    )(xf, gp, g.reshape(b, h * wd, cout), wmb)
    dx = dx.reshape(b, h, wd, cin)
    # unpack the dot slabs back to (k, k, cin, cout)
    dw = jnp.zeros((k, k, cin, cout), jnp.float32)
    for di, (ci, dys) in enumerate(dots):
        dx0, wc = chunks[ci]
        for pos, (dy, j) in enumerate([(dy, j) for dy in dys for j in range(wc)]):
            dw = dw.at[dy, dx0 + j].set(dwp[di, pos * cin : (pos + 1) * cin])
    return dx, dw.astype(w.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_small_c_pallas(x, w, padding):
    return _pallas_conv_fwd(x, w, padding)


def _csc_fwd(x, w, padding):
    return _pallas_conv_fwd(x, w, padding), (x, w)


def _csc_bwd(padding, res, g):
    x, w = res
    return _pallas_conv_bwd(x, w, g, padding)


_conv_small_c_pallas.defvjp(_csc_fwd, _csc_bwd)


def conv_small_c(x: jnp.ndarray, w: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Stride-1 KxK conv, NHWC, HWIO weights; Pallas tap-packed path on TPU for
    lane-starved channel counts at shape-preserving padding; lax fallback
    elsewhere.

    STATUS: UNROUTED — measured negative (round 3, PERF_NOTES): even the best
    formulation (in-kernel f32 rolls, zero host packing) runs 4.0 vs lax 2.4 ms
    fwd+bwd at the 224²×32ch target because building 128-lane operands from
    32-lane data costs ~2 GB/step of VPU-speed VMEM traffic against a ~1.2 ms
    MXU saving. The production answer for those sites is space-to-depth
    residency (``nn/blocks.py::UnetResBlockS2D``). Kept as a tested,
    documented negative result; do not re-route without beating that."""
    b, h, wd, cin = x.shape
    k = w.shape[0]
    cout = w.shape[3]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    vmem_need = (
        # resident H-padded maps for x and (bwd) cotangent + windows + operands
        2 * ((h + k) * wd * 2 * (cin + cout) + (_row_block(h) + k) * wd * 2 * (k * max(cin, cout) + 128))
    )
    ok = (
        on_tpu and w.shape[0] == w.shape[1] and k % 2 == 1 and 3 <= k <= 7
        and padding == k // 2
        and cin in (8, 16, 32, 64) and cout % 8 == 0 and cout <= 256
        and _row_block(h) % 8 == 0 and wd % 8 == 0 and h * wd >= 112 * 112
        and vmem_need <= 80 * 1024 * 1024 and h >= k and wd >= k
    )
    if ok:
        # CAVEAT (ADVICE r4): this except only covers TRACE-TIME errors. When
        # conv_small_c is traced inside an outer jit, Pallas/Mosaic *backend*
        # compilation happens at XLA-compile time, after tracing, outside this
        # try — an untested shape inside the 'ok' envelope can still fail the
        # whole outer compile. A production routing would need a cached one-time
        # interpret/compile probe per shape instead. Moot for the shipped
        # framework: this kernel is a measured NEGATIVE result (PERF_NOTES r3)
        # kept unrouted under tools/negative_results as the record.
        try:
            return _conv_small_c_pallas(x, w, padding)
        except Exception:  # noqa: BLE001 — trace-time Mosaic/shape errors only
            pass
    return _lax_conv(x, w, padding)
