"""Pallas TPU kernel for the GMM -> quantized-frequency pipeline.

Fuses the whole chain Φ(edges) -> PMF diff -> K-mixture sum -> integer
frequency quantization into one Mosaic kernel, so none of the
(B, K, M, S, hw) intermediates ever touch HBM.  The per-channel grid
centers are a tiny XLA reduction computed outside the kernel (same op
order as the XLA pipeline), which lets the kernel grid chunk the spatial
axis when a full (M, S, hw) block would exceed VMEM.  The XLA version (models/hesic_fast._gmm_freq_fast) materializes
~4 GB of intermediates per batch-16 call at mm=32 and measured ~40 ms;
this kernel is erfc-compute-bound.

Mosaic has no erf/erfc primitive, so Φ uses the Abramowitz & Stegun
7.1.26 rational approximation (|error| <= 1.5e-7 on erfc, well below the
1/65536 frequency resolution).  The values differ from XLA's erfc in the
last bits — that is SAFE because encoder and decoder share the same
compiled program (the bit-exactness invariant of models/hesic_fast), but
it does mean a stream encoded with the Pallas PMF must be decoded with
it (true by construction: backend selection is process-wide).

Outputs match the XLA pipeline's contract: integer rows summing to 2^16
with every bin >= 1, grid centered at round(spatial mean of the mixture
mean) per channel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .det_math import det_qscale, det_recip, det_std_cdf, det_steal

_TOTAL = 1 << 16

# A&S 7.1.26 coefficients
_P = 0.3275911
_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429
_INV_SQRT2 = 0.7071067811865476


def _std_cdf(x):
    """Standard normal CDF via A&S 7.1.26 erfc (f32, Mosaic-lowerable)."""
    z = jnp.abs(x) * _INV_SQRT2
    t = 1.0 / (1.0 + _P * z)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    erfc_z = poly * jnp.exp(-z * z)            # erfc(|x|/sqrt(2))
    # Φ(x) = 0.5*erfc(-x/sqrt(2)); reflect for negative x
    return jnp.where(x >= 0, 1.0 - 0.5 * erfc_z, 0.5 * erfc_z)


def _pmf_kernel(cen_ref, mu_ref, sc_ref, w_ref, freq_ref, pmf_s,
                *, mm, k):
    mu = mu_ref[0]                              # (K, Mt, Ht)
    sc = sc_ref[0]
    wgt = w_ref[0]                              # (K, Mt, Ht) or (K, Mt, 1)
    center = cen_ref[0].astype(jnp.float32)     # (Mt, 1)

    # deterministic reciprocal/CDF (det_math): the same traced ops run in
    # the plain-XLA path, and Mosaic/XLA:TPU execute them bit-identically
    # (measured 0/2M mismatches) — the basis for the format-v2 container
    # having no backend byte
    inv_sc = det_recip(sc)
    s_dim = 2 * mm + 1

    def edge_cdf(s):
        e = (float(s - mm) - 0.5) + center[None, :, :]   # (1, Mt, 1)
        return det_std_cdf((e - mu) * inv_sc)            # (K, Mt, Ht)

    # reduction orders are part of the format: mixture sum unrolled in
    # ascending k, total accumulated in ascending s (mirrored exactly by
    # models/hesic_fast._gmm_freq_fast)
    total = None
    prev = edge_cdf(0)
    for s in range(1, s_dim + 1):
        cur = edge_cdf(s)
        diff = (cur - prev) * wgt
        acc = diff[0]
        for kk in range(1, k):
            acc = acc + diff[kk]
        p_s = jnp.maximum(acc, 0.0)                      # (Mt, Ht)
        pmf_s[:, s - 1, :] = p_s
        total = p_s if total is None else total + p_s
        prev = cur

    pmf = pmf_s[...]                            # (Mt, S, Ht)
    qscale = det_qscale(total)[:, None, :]
    # The kernel emits the RAW floored rows; the deficit steal happens
    # OUTSIDE in gmm_freq_pallas on the materialized kernel output.
    # Rationale: the steal needs two reads of freq (sum + argmax), and
    # when the float chain above gets rematerialized per consumer with
    # different FMA contraction (XLA:CPU / interpreter CI — in-kernel
    # optimization_barrier, scratch round-trips, and single-trip loops
    # were all functionalized away, measured r4), the two reads can
    # disagree and silently break the sum-to-65536 invariant.  A kernel
    # *output* is a real buffer, and the steal itself is integer-only
    # (det_math.det_steal) — recomputation-safe by construction.
    freq_ref[0] = jnp.maximum(jnp.floor(pmf * qscale),
                              1.0).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("mm", "k", "interpret"))
def gmm_freq_pallas(sigma, means, weights, mm: int, k: int, center=None,
                    interpret: bool = False):
    """Drop-in Pallas version of models/hesic_fast._gmm_freq_fast.

    sigma/means: (B, h, w, M*K) head outputs (channel k*M+m);
    weights: same, or (B, 1, 1, M*K) for the spatially-pooled head;
    center: optional (B, M) int32 grid centers (data-derived; when None
    the prediction-derived centers are computed here in XLA).
    Returns (freq (B, M, S, hw) int32, center (B, M) int32).
    """
    b, h, w, mk = sigma.shape
    m = mk // k
    hw = h * w
    s_dim = 2 * mm + 1

    def lanes4(t):
        t = t.reshape(b, -1, k, m).transpose(0, 2, 3, 1)
        return t.astype(jnp.float32)             # (B, K, M, hw or 1)

    mu = lanes4(means)
    sc = jnp.maximum(lanes4(sigma), 0.11)
    spatial_w = not (weights.shape[1] == 1 and weights.shape[2] == 1)
    wgt = lanes4(weights)                        # (B, K, M, hw) or (..,1)
    if not spatial_w:
        wgt = jnp.broadcast_to(wgt, (b, k, m, 1))

    # Grid centers are a tiny XLA reduction computed OUTSIDE the kernel
    # (same op order as _gmm_freq_fast, so the two backends agree on the
    # grids); keeping them out of the kernel is what lets the grid chunk
    # the spatial axis when (M, S, hw) would not fit VMEM.
    if center is None:
        mix_mean = jnp.sum(mu * wgt, axis=1)     # (B, M, hw) or (.., 1)
        cen = jnp.round(jnp.mean(mix_mean, axis=-1)).astype(jnp.int32)
    else:
        cen = center.astype(jnp.int32)

    # Block sizes: Mt channels (8-aligned divisor of M, or M itself) and
    # Ht spatial points (128-aligned divisor of hw, or hw itself) bounded
    # by VMEM for the (Mt, S, Ht) pmf accumulator + (K, Mt, Ht) per-edge
    # temporaries.  When no channel block fits at full hw, fall back to
    # chunking hw instead of exceeding VMEM (advisor r2 finding).
    budget = 4 * 1024 * 1024

    def block_bytes(mt, ht):
        return (s_dim + 6 * k + 8) * ht * 4 * mt

    m_divs = [d for d in range(m, 0, -1)
              if m % d == 0 and (d % 8 == 0 or d == m)]
    mt = next((d for d in m_divs if block_bytes(d, hw) <= budget), None)
    ht = hw
    if mt is None:
        mt = m_divs[-1]                          # smallest aligned divisor
        hw_divs = [d for d in range(hw, 0, -1)
                   if hw % d == 0 and (d % 128 == 0 or d == hw)]
        ht = next((d for d in hw_divs if block_bytes(mt, d) <= budget),
                  hw_divs[-1])
    grid = (b, m // mt, hw // ht)

    w_ht = ht if spatial_w else 1
    w_idx = ((lambda i, j, l: (i, 0, j, l)) if spatial_w
             else (lambda i, j, l: (i, 0, j, 0)))
    freq = pl.pallas_call(
        functools.partial(_pmf_kernel, mm=mm, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, mt, 1), lambda i, j, l: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, mt, ht), lambda i, j, l: (i, 0, j, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, mt, ht), lambda i, j, l: (i, 0, j, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, mt, w_ht), w_idx,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, mt, s_dim, ht), lambda i, j, l: (i, j, 0, l),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, s_dim, hw), jnp.int32),
        scratch_shapes=[pltpu.VMEM((mt, s_dim, ht), jnp.float32)],
        interpret=interpret,
    )(cen[:, :, None], mu, sc, wgt)
    # integer-only deficit steal on the materialized kernel output (see
    # the note in _pmf_kernel); the barrier pins one copy of the buffer
    freq = det_steal(jax.lax.optimization_barrier(freq), axis=2)
    return freq, cen
