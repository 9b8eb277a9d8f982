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


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def warp_perspective_mxu(src, m, dsize, win: int = 64,
                         rows_per_block: int = 8,
                         compute_dtype=jnp.bfloat16):
    """Warp a batch of NHWC images by homographies, MXU formulation.

    src: (B, H, W, C); m: (B, 3, 3); dsize: (Ho, Wo).
    Returns (out (B, Ho, Wo, C) float32, overflow_count ()): overflow
    counts taps masked to zero because a block's vertical spread exceeded
    the window (not image-border zero padding, which is exact).
    """
    src = jnp.asarray(src)
    b, h, w, c = src.shape
    ho, wo = dsize
    win = min(win, h)
    r = rows_per_block
    nb = -(-ho // r)
    ho_pad = nb * r

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

    # per-block source-row window
    y0b = y0.reshape(b, nb, r, wo)
    start = jnp.clip(jnp.min(y0b, axis=(2, 3)), 0, h - win)  # (B, NB)
    yl = y0b - start[..., None, None]                        # local row idx

    in_y0b = in_y0.reshape(b, nb, r, wo)
    in_y1b = in_y1.reshape(b, nb, r, wo)
    win_y0 = (yl >= 0) & (yl <= win - 1)
    win_y1 = (yl + 1 >= 0) & (yl + 1 <= win - 1)
    overflow = (jnp.sum(in_y0b & ~win_y0) + jnp.sum(in_y1b & ~win_y1))

    wy1b = wy1.reshape(b, nb, r, wo)
    wx1b = wx1.reshape(b, nb, r, wo)
    x0b = x0.reshape(b, nb, r, wo)
    in_x0b = in_x0.reshape(b, nb, r, wo)
    in_x1b = in_x1.reshape(b, nb, r, wo)

    cd = compute_dtype
    src_c = src.astype(cd)
    q = r * wo

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

        ylq = yl[:, blk].reshape(b, q, 1)
        wyq = wy1b[:, blk].reshape(b, q, 1).astype(cd)
        my0 = (in_y0b[:, blk] & win_y0[:, blk]).reshape(b, q, 1)
        my1 = (in_y1b[:, blk] & win_y1[:, blk]).reshape(b, q, 1)
        vi = jax.lax.broadcasted_iota(jnp.int32, (b, q, win), 2)
        wy = (jnp.where((vi == ylq) & my0, (1 - wyq), cd(0))
              + jnp.where((vi == ylq + 1) & my1, wyq, cd(0)))  # (B, q, win)

        # HIGHEST so the f32 path is exact (TPU default f32 matmul runs
        # reduced-precision); no effect on the bf16 fast path
        t = jnp.einsum("bqx,bvxc->bqvc", gx, src_win,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum("bqv,bqvc->bqc", wy.astype(jnp.float32), t,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(b, r, wo, c)

    blocks = jax.lax.map(block, jnp.arange(nb))       # (NB, B, r, Wo, C)
    out = blocks.transpose(1, 0, 2, 3, 4).reshape(b, ho_pad, wo, c)
    return out[:, :ho].astype(jnp.float32), overflow
