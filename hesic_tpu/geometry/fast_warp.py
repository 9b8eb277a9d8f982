"""MXU-friendly homography warp (gather-free).

``warp_perspective`` (homography.py) is exact but gather-bound: TPU has no
fast hardware gather, and the 512x512 warp measured ~7 ms/image — it ran
4x per fast-codec roundtrip and dominated the pipeline (round-2 profile).

This formulation plays to the MXU instead: bilinear weights are separable
(w_tap = wy_r * wx_s), so the warp is two one-hot contractions
  T(q, v, c)   = sum_x Gx(q, x) * src_win(v, x, c)      [MXU matmul]
  out(q, c)    = sum_v Wy(q, v) * T(q, v, c)            [tiny reduction]
with Gx/Wy carrying both the interpolation weights and the zero-padding
masks.  The sum over source rows v runs over a WIN-row window selected per
R-row output block by a data-dependent ``dynamic_slice`` (the window start
adapts to the homography, so any translation is supported; only vertical
SPREAD within a block — strong rotation/shear — can overflow).  Taps
falling outside the window are masked to zero, never wrapped, and the
overflow count is returned so callers can detect degradation.

Intended for the fast codec's compiled programs (both codec sides share
the executable, so only determinism matters, not dtype); ``forward()`` and
the reference-layout container keep the exact gather warp for
kornia-parity (reference newnet1.py:746).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _coords(m, h_out, w_out):
    # elementwise projective transform: a matmul here would go through the
    # MXU at default (reduced) f32 precision and visibly perturb the
    # sampling weights; VPU elementwise math is exact f32
    m_inv = jnp.linalg.inv(m)  # (B, 3, 3)
    ys, xs = jnp.meshgrid(jnp.arange(h_out, dtype=jnp.float32),
                          jnp.arange(w_out, dtype=jnp.float32),
                          indexing="ij")
    mi = m_inv[:, :, :, None, None]  # (B, 3, 3, 1, 1)
    px = mi[:, 0, 0] * xs + mi[:, 0, 1] * ys + mi[:, 0, 2]
    py = mi[:, 1, 0] * xs + mi[:, 1, 1] * ys + mi[:, 1, 2]
    pz = mi[:, 2, 0] * xs + mi[:, 2, 1] * ys + mi[:, 2, 2]
    pz = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
    return px / pz, py / pz  # sx, sy (B, Ho, Wo)


def pick_warp_win(m_np, h_out: int, w_out: int,
                  rows_per_block: int = 8,
                  choices=(16, 32, 64), margin: int = 4) -> int:
    """Host-side static window choice for ``warp_perspective_mxu``.

    The x-contraction carries ``win`` source rows through the MXU per
    output block, so the kernel's FLOPs scale linearly with ``win`` —
    64 is ~32x the 2 bilinear taps actually needed for near-rectified
    homographies (the HESIC stereo case).  This measures the real
    per-block vertical spread of the source rows on a coarse column
    grid (every 32nd column + the last, all rows, f64 numpy) and picks
    the smallest window bucket that covers it plus a safety margin.

    Deterministic by construction: pure f64 numpy on the container's
    f32 H bytes, so encoder and decoder always select the same compiled
    program — the shared-executable bit-exactness invariant holds for
    every choice, and an undersized window only ever degrades quality
    (taps masked to zero, counted by the kernel's overflow output),
    never codec correctness.
    """
    m = np.asarray(m_np, np.float64).reshape(-1, 3, 3)
    mi = np.linalg.inv(m)
    ys = np.arange(h_out, dtype=np.float64)
    xs = np.unique(np.concatenate(
        [np.arange(0, w_out, 32, dtype=np.float64), [w_out - 1.0]]))
    gx, gy = np.meshgrid(xs, ys)                       # (Ho, Xc)
    num = (mi[:, 1, 0, None, None] * gx + mi[:, 1, 1, None, None] * gy
           + mi[:, 1, 2, None, None])
    den = (mi[:, 2, 0, None, None] * gx + mi[:, 2, 1, None, None] * gy
           + mi[:, 2, 2, None, None])
    den = np.where(np.abs(den) < 1e-8, 1e-8, den)
    y0 = np.floor(num / den)                           # (B, Ho, Xc)
    r = rows_per_block
    nb = -(-h_out // r)
    pad = nb * r - h_out
    if pad:
        y0 = np.concatenate([y0, np.repeat(y0[:, -1:], pad, axis=1)],
                            axis=1)
    y0b = y0.reshape(y0.shape[0], nb, r, -1)
    spread = (y0b.max(axis=(2, 3)) - y0b.min(axis=(2, 3))).max()
    need = int(spread) + 2 + margin                    # 2 bilinear taps
    for c in choices:
        if c >= need:
            return c
    return choices[-1]


#: Static bound on the per-image global column shift folded into the
#: banded warp's source slice (pick_warp_xwin returns None beyond it).
_XSHIFT_BOUND = 128


def pick_warp_xwin(m_np, h_out: int, w_out: int, xblock: int = 128,
                   margin: int = 4):
    """Host-side static source-COLUMN window for the banded x
    contraction of ``warp_perspective_mxu``.

    The x one-hot contraction carries W source columns per output pixel
    when un-banded; after subtracting the per-image global column shift
    (the device-exact min disparity, folded into the source slice) the
    residual source columns of an ``xblock``-wide output block live in
    [0, xblock + disparity-span), so the contraction can run over
    ``xwin`` columns instead — FLOPs scale by xwin/W (~3.5x cut at 512
    wide).  Measures the real disparity span on a coarse row grid
    (exact in x) and returns the smallest window bucket covering
    xblock + span + taps + margin, or None when no bucket fits or the
    global shift exceeds the kernel's static bound (caller falls back
    to the full-width contraction).

    Deterministic pure f64 numpy on the container's f32 H bytes, like
    ``pick_warp_win`` — encoder and decoder derive the same window, so
    the shared-executable bit-exactness invariant holds.  The banded
    program is bit-identical to the full one whenever no tap overflows
    the window (adding zeros is exact; the 4 bilinear taps merge the
    same way), and overflow only masks taps to zero (counted), never
    corrupts the codec.
    """
    m = np.asarray(m_np, np.float64).reshape(-1, 3, 3)
    mi = np.linalg.inv(m)
    ys = np.unique(np.concatenate(
        [np.arange(0, h_out, 16, dtype=np.float64), [h_out - 1.0]]))
    xs = np.arange(w_out, dtype=np.float64)
    gx, gy = np.meshgrid(xs, ys)
    num = (mi[:, 0, 0, None, None] * gx + mi[:, 0, 1, None, None] * gy
           + mi[:, 0, 2, None, None])
    den = (mi[:, 2, 0, None, None] * gx + mi[:, 2, 1, None, None] * gy
           + mi[:, 2, 2, None, None])
    den = np.where(np.abs(den) < 1e-8, 1e-8, den)
    x0 = np.floor(num / den)                           # (B, Yc, W)
    # the kernel's dxg uses CLIPPED coords (out-of-image taps are
    # masked anyway); match that definition exactly
    dx = np.clip(x0, 0, w_out - 1) - gx[None]
    dmin = dx.min(axis=(1, 2))                         # per image
    if np.abs(dmin).max() > _XSHIFT_BOUND - margin:
        return None
    span = int((dx.max(axis=(1, 2)) - dmin).max())
    need = xblock + span + 2 + margin
    for cand in (xblock + 16, xblock + 64, xblock + 128):
        if cand >= need and cand < w_out:
            return cand
    return None


def _edge_pad_w(a, wo_pad: int):
    """Edge-replicate 2-D-grid arrays (..., Wo) to (..., wo_pad) — the
    same padding pick_warp_xwin used, so its span guarantee holds."""
    pad = wo_pad - a.shape[-1]
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.repeat(a[..., -1:], pad, axis=-1)], axis=-1)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def warp_perspective_mxu(src, m, dsize, win: int = 64,
                         rows_per_block: int = 8,
                         compute_dtype=jnp.bfloat16,
                         xwin: int = None, xblock: int = 128):
    """Warp a batch of NHWC images by homographies, MXU formulation.

    src: (B, H, W, C); m: (B, 3, 3); dsize: (Ho, Wo).
    Returns (out (B, Ho, Wo, C) float32, overflow_count ()): overflow
    counts taps masked to zero because a block's vertical spread exceeded
    the window (not image-border zero padding, which is exact).

    ``xwin`` (from ``pick_warp_xwin``) additionally bands the x
    contraction to a per-column-block source window, cutting the MXU
    FLOPs by ~W/xwin at bit-identical output (overflowed x taps are
    masked to zero and counted, like the y window).
    """
    src = jnp.asarray(src)
    b, h, w, c = src.shape
    ho, wo = dsize
    win = min(win, h)
    r = rows_per_block
    nb = -(-ho // r)
    ho_pad = nb * r
    banded = xwin is not None and xwin < w
    if banded:
        nbx = -(-wo // xblock)
        wo_pad = nbx * xblock
    else:
        wo_pad = wo

    sx, sy = _coords(jnp.asarray(m, jnp.float32), ho_pad, wo)
    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    wx1 = sx - x0f
    wy1 = sy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    in_x0 = (x0 >= 0) & (x0 <= w - 1)
    in_x1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    in_y0 = (y0 >= 0) & (y0 <= h - 1)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    if banded and wo_pad != wo:
        (x0, y0, wx1, wy1, in_x0, in_x1, in_y0, in_y1) = (
            _edge_pad_w(a, wo_pad)
            for a in (x0, y0, wx1, wy1, in_x0, in_x1, in_y0, in_y1))
    wo_eff = wo_pad

    # per-block source-row window
    y0b = y0.reshape(b, nb, r, wo_eff)
    start = jnp.clip(jnp.min(y0b, axis=(2, 3)), 0, h - win)  # (B, NB)
    yl = y0b - start[..., None, None]                        # local row idx

    in_y0b = in_y0.reshape(b, nb, r, wo_eff)
    in_y1b = in_y1.reshape(b, nb, r, wo_eff)
    win_y0 = (yl >= 0) & (yl <= win - 1)
    win_y1 = (yl + 1 >= 0) & (yl + 1 <= win - 1)
    overflow = (jnp.sum(in_y0b & ~win_y0) + jnp.sum(in_y1b & ~win_y1))

    wy1b = wy1.reshape(b, nb, r, wo_eff)
    wx1b = wx1.reshape(b, nb, r, wo_eff)
    x0b = x0.reshape(b, nb, r, wo_eff)
    in_x0b = in_x0.reshape(b, nb, r, wo_eff)
    in_x1b = in_x1.reshape(b, nb, r, wo_eff)

    cd = compute_dtype
    src_c = src.astype(cd)
    q = r * wo_eff

    def _wy_mask(blk, shape3):
        """One-hot y weights for a block, pixels reshaped to shape3."""
        ylq = yl[:, blk].reshape(shape3)
        wyq = wy1b[:, blk].reshape(shape3).astype(cd)
        my0 = (in_y0b[:, blk] & win_y0[:, blk]).reshape(shape3)
        my1 = (in_y1b[:, blk] & win_y1[:, blk]).reshape(shape3)
        vi = jax.lax.broadcasted_iota(jnp.int32,
                                      shape3[:-1] + (win,),
                                      len(shape3) - 1)
        return (jnp.where((vi == ylq) & my0, (1 - wyq), cd(0))
                + jnp.where((vi == ylq + 1) & my1, wyq, cd(0)))

    def block(blk):
        # (B, win, W, C) source window for this block
        def slice_one(img, s):
            return jax.lax.dynamic_slice(img, (s, 0, 0), (win, w, c))
        src_win = jax.vmap(slice_one)(src_c, start[:, blk])

        xq = x0b[:, blk].reshape(b, q, 1)
        wxq = wx1b[:, blk].reshape(b, q, 1).astype(cd)
        mx0 = in_x0b[:, blk].reshape(b, q, 1)
        mx1 = in_x1b[:, blk].reshape(b, q, 1)
        xi = jax.lax.broadcasted_iota(jnp.int32, (b, q, w), 2)
        gx = (jnp.where((xi == xq) & mx0, (1 - wxq), cd(0))
              + jnp.where((xi == xq + 1) & mx1, wxq, cd(0)))   # (B, q, W)

        wy = _wy_mask(blk, (b, q, 1))                 # (B, q, win)

        # HIGHEST so the f32 path is exact (TPU default f32 matmul runs
        # reduced-precision); no effect on the bf16 fast path
        t = jnp.einsum("bqx,bvxc->bqvc", gx, src_win,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum("bqv,bqvc->bqc", wy.astype(jnp.float32), t,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(b, r, wo_eff, c), jnp.zeros((), jnp.int32)

    if banded:
        # per-image global column shift: u = x0 - dxg maps every
        # in-image source column into a narrow band around its output
        # column, so each xblock of output columns reads a STATIC
        # [j*xblock, j*xblock + xwin) window of the shifted source.
        # dxg is an exact device min -> identical on both codec sides.
        # cap the column index at wo-1 so edge-replicated pad columns
        # reproduce the last real column's disparity (matches
        # pick_warp_xwin's span/shift estimate exactly)
        xo_grid = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, x0.shape, 2), wo - 1)
        x0c = jnp.clip(x0, 0, w - 1)
        dxg = jnp.clip(jnp.min(x0c - xo_grid, axis=(1, 2)),
                       -_XSHIFT_BOUND, _XSHIFT_BOUND)        # (B,)
        src_p = jnp.pad(src_c, ((0, 0), (0, 0),
                                (_XSHIFT_BOUND, _XSHIFT_BOUND), (0, 0)))
        # the shifted slice is wider than the image so a negative dxg
        # cannot cut off the right edge (u spans [0, w - dxg))
        wsl = w + _XSHIFT_BOUND
        # right padding so the last static window fits
        xpad = max(0, (nbx - 1) * xblock + xwin - wsl)
        jblk = (jnp.arange(nbx, dtype=jnp.int32)
                * xblock)[None, :, None, None]

    def block_banded(blk):
        # y window as in block(), shifted by the global dx; then STATIC
        # per-column-block x windows: the contraction runs over xwin
        # source columns instead of W
        def slice_one(img, sy, su):
            return jax.lax.dynamic_slice(img, (sy, su, 0), (win, wsl, c))
        src_win = jax.vmap(slice_one)(src_p, start[:, blk],
                                      dxg + _XSHIFT_BOUND)
        if xpad:
            src_win = jnp.pad(src_win,
                              ((0, 0), (0, 0), (0, xpad), (0, 0)))
        src_x = jnp.stack(
            [jax.lax.slice_in_dim(src_win, j * xblock,
                                  j * xblock + xwin, axis=2)
             for j in range(nbx)], axis=1)          # (B, nbx, win, xwin, C)

        def to_q2(a):
            # (B, r, wo_eff) -> (B, nbx, r*xblock, 1)
            return (a.reshape(b, r, nbx, xblock).transpose(0, 2, 1, 3)
                     .reshape(b, nbx, r * xblock, 1))

        xl = to_q2(x0b[:, blk]) - dxg[:, None, None, None] - jblk
        wxq = to_q2(wx1b[:, blk]).astype(cd)
        mx0 = to_q2(in_x0b[:, blk]) != 0
        mx1 = to_q2(in_x1b[:, blk]) != 0
        wx0_in = (xl >= 0) & (xl <= xwin - 1)
        wx1_in = (xl + 1 >= 0) & (xl + 1 <= xwin - 1)
        ovf = (jnp.sum(mx0 & ~wx0_in) + jnp.sum(mx1 & ~wx1_in)) \
            .astype(jnp.int32)
        xi = jax.lax.broadcasted_iota(
            jnp.int32, (b, nbx, r * xblock, xwin), 3)
        gx = (jnp.where((xi == xl) & mx0 & wx0_in, (1 - wxq), cd(0))
              + jnp.where((xi == xl + 1) & mx1 & wx1_in, wxq, cd(0)))

        # y weights, pixels in the same (nbx, r*xblock) order
        ylq = to_q2(yl[:, blk])
        wyq = to_q2(wy1b[:, blk]).astype(cd)
        my0 = to_q2(in_y0b[:, blk] & win_y0[:, blk]) != 0
        my1 = to_q2(in_y1b[:, blk] & win_y1[:, blk]) != 0
        vi = jax.lax.broadcasted_iota(
            jnp.int32, (b, nbx, r * xblock, win), 3)
        wy = (jnp.where((vi == ylq) & my0, (1 - wyq), cd(0))
              + jnp.where((vi == ylq + 1) & my1, wyq, cd(0)))

        t = jnp.einsum("bjqx,bjvxc->bjqvc", gx, src_x,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum("bjqv,bjqvc->bjqc", wy.astype(jnp.float32), t,
                         precision=jax.lax.Precision.HIGHEST)
        out = (out.reshape(b, nbx, r, xblock, c).transpose(0, 2, 1, 3, 4)
                  .reshape(b, r, wo_eff, c))
        return out, ovf

    blocks, ovf_x = jax.lax.map(
        block_banded if banded else block,
        jnp.arange(nb))                               # (NB, B, r, Wo, C)
    out = blocks.transpose(1, 0, 2, 3, 4).reshape(b, ho_pad, wo_eff, c)
    return (out[:, :ho, :wo].astype(jnp.float32),
            overflow + jnp.sum(ovf_x))


def warp_perspective_train(src, m, dsize=None, dtype=None, win: int = 64):
    """Differentiation-friendly homography warp for model forwards.

    Drop-in for ``warp_perspective`` inside training/likelihood paths.
    The pure-JAX gather warp's VJP materializes (B, H, W, 2, 2, C) tap
    blocks whose tiny minor dims tile-pad 64-128x on TPU: the backward
    at (8, 512, 512, 3) needs 54 GB of HLO temps and only compiles
    under heavy remat (measured 24 s/train-step, BENCH_MODE=train).
    The banded one-hot contraction differentiates into matmuls instead:
    measured fwd 11.6 ms bf16 / 88 ms f32-HIGHEST vs 58 ms gather fwd
    (backward 24 ms bf16 / 85 ms f32), and the f32 path matches the
    gather warp to 1.8e-7 max abs (exact bilinear weights, HIGHEST-
    precision f32 contractions).

    ``dtype`` follows the owning module's transform dtype: bf16
    training gets the fast bf16 warp (consistent with its bf16 convs),
    f32 gets near-exact f32.  ``win`` bounds the vertical source
    displacement the banded contraction can express (64 px covers
    stereo-rig homographies; raise for extreme geometry — overflowed
    taps are masked to zero, as the codec side counts via
    ``pick_warp_win``)."""
    if dsize is None:
        dsize = (src.shape[1], src.shape[2])
    return warp_perspective_mxu(
        src, m, dsize, win,
        compute_dtype=(dtype or jnp.float32))[0]
