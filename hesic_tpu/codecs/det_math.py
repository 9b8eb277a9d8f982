"""Backend-deterministic float32 math for the fast-container PMF pipeline.

Why this exists (measured, r4): the two PMF backends (Mosaic kernel,
plain-XLA path) disagreed in the last bits, so fast containers carried a
backend byte and decode failed loudly on a mismatch (r3 ADVICE fix).
The divergence comes from exactly two sources:

  * transcendentals: ``jnp.exp`` on XLA:TPU/Mosaic vs XLA:CPU differ by
    up to 64 ULP (measured on a 2M-point sweep);
  * division: TPU lowers f32 div to a Newton-refined reciprocal that is
    not IEEE-rounded; Mosaic and XLA:TPU additionally disagreed with
    each other (12 ULP on the A&S erfc pipeline).

Everything else in the pipeline is plain f32 mul/add/floor/compare,
which Mosaic and XLA:TPU execute strict-IEEE (verified bitwise against
numpy on 2M points).  So this module re-implements the two divergent
primitives from deterministic ops only:

  * ``det_recip``: bit-trick seed + 3 Newton iterations (mul/sub only);
  * ``det_exp``:   exp2-based — k = floor(y+0.5), degree-7 Taylor for
    2^f on |f| <= 0.5, scale by bit-assembling 2^k;
  * ``det_std_cdf``: the A&S 7.1.26 normal CDF on top of the above
    (|error| <= 3.5e-7 vs f64 erfc, measured — well under the 1/65536
    frequency resolution).

With these, the Mosaic PMF kernel and the XLA path produce bit-equal
frequency tables ON THE SAME BACKEND (TPU: verified 0/2M mismatches
Mosaic vs XLA:TPU; CPU: interpret-mode Pallas IS the XLA path), which
demotes the container's backend byte to a format-version byte.

What this does NOT buy — documented honestly:

* cross-HOST portability (encode on TPU, decode on a CPU-only host).
  XLA:CPU contracts mul+add chains into FMAs (verified: XLA:CPU
  deviates from strict-IEEE numpy on the Newton iteration itself; TPU
  does not), and more fundamentally the decoder recomputes the GMM
  head outputs from z_hat with conv stacks whose reduction orders are
  backend-specific.  The reference has the same property (a
  torch-CUDA-encoded container is not bit-guaranteed to decode on
  torch-CPU, newnet1.py:925-983 recomputes PMFs from convs); no
  per-pixel-adaptive codec can be cross-host portable without shipping
  the model outputs themselves.
* cross-PROGRAM bit-equality on XLA:CPU.  CPU codegen contracts FMAs
  per fusion and splits loops per thread/SIMD layout, so the same op
  sequence in two different executables can differ in the last bit
  (measured: identical sweeps flipped between 0 and 1636/34816
  mismatching flat-PMF bins across runs/flag changes).  Within one
  process this is harmless — encode and decode share cached
  executables — and the Pallas path never runs in production on CPU
  (models/hesic_fast._use_pallas).  The binding cross-path claim is
  therefore ON TPU only, where float ops are strict-IEEE: verified
  on-chip each round by tools/check_roundtrip_tpu.py and recorded in
  the committed TPU_CHECK artifact; CI keeps a closeness tripwire.

Reduction-order rule for callers: any float reduction feeding the
quantizer must accumulate in an explicit, identical order in both
backends (sequential over the symbol axis; unrolled over the mixture
axis).  ``det_freq_rows`` packages the quantization tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_TOTAL = 1 << 16

_P = np.float32(0.3275911)
_A1 = np.float32(0.254829592)
_A2 = np.float32(-0.284496736)
_A3 = np.float32(1.421413741)
_A4 = np.float32(-1.453152027)
_A5 = np.float32(1.061405429)
_INV_SQRT2 = np.float32(0.7071067811865476)
_LOG2E = np.float32(1.4426950408889634)
# Cody-Waite split of ln2: HI is exact in f32 (355/512), LO the residue —
# keeps the range reduction r = v - k*ln2 accurate for |k| up to 2^15
_LN2_HI = np.float32(0.693359375)
_LN2_LO = np.float32(-2.12194440e-4)
# Taylor 1/n! for e^r, |r| <= 0.3466 (error ~5e-9)
_EXP_C = [np.float32(c) for c in (
    1.0, 1.0, 0.5, 1.0 / 6, 1.0 / 24, 1.0 / 120, 1.0 / 720, 1.0 / 5040)]


def det_recip(d):
    """Deterministic f32 reciprocal: bit-trick seed (rel err ~5%) + 3
    Newton iterations — pure mul/sub, identical bits on every strict-
    IEEE backend.  Accurate to ~1 ULP (not correctly rounded — that is
    fine; reproducibility, not roundness, is the requirement)."""
    x = jax.lax.bitcast_convert_type(
        np.int32(0x7EF311C3) - jax.lax.bitcast_convert_type(d, jnp.int32),
        jnp.float32)
    for _ in range(3):
        x = x * (jnp.float32(2.0) - d * x)
    return x


def det_exp(v):
    """Deterministic f32 exp for v <= 0 (flushes below 2^-126 to 0).

    Cody-Waite reduction (k = round(v*log2e), r = v - k*ln2 via the
    hi/lo split) + degree-7 Taylor for e^r + bit-assembled 2^k; ~1 ULP
    for all in-range v, and bit-identical on every strict-IEEE backend.
    """
    k = jnp.floor(v * _LOG2E + jnp.float32(0.5))
    r = (v - k * _LN2_HI) - k * _LN2_LO
    p = _EXP_C[7]
    for c in reversed(_EXP_C[:7]):
        p = p * r + c
    ki = k.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        jnp.left_shift(ki + jnp.int32(127), 23), jnp.float32)
    return jnp.where(ki < jnp.int32(-126), jnp.float32(0.0), p * scale)


def det_std_cdf(x):
    """Standard normal CDF, A&S 7.1.26 erfc over det_recip/det_exp."""
    z = jnp.minimum(jnp.abs(x) * _INV_SQRT2, jnp.float32(16.0))
    t = det_recip(jnp.float32(1.0) + _P * z)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    erfc_z = poly * det_exp(-z * z)
    h = jnp.float32(0.5)
    return jnp.where(x >= 0, jnp.float32(1.0) - h * erfc_z, h * erfc_z)


def det_qscale(total):
    """65536 / total with the deterministic reciprocal (total >= 0)."""
    return jnp.float32(float(_TOTAL)) * det_recip(
        jnp.maximum(total, jnp.float32(1e-30)))


def det_steal(freq, axis: int):
    """Integer-only steal: add the row deficit (65536 - sum) to the
    FIRST max bin.  ``freq`` must already be int32; integer arithmetic
    has no FMA/contraction hazard, so even if XLA recomputes this chain
    per consumer every copy is bit-identical and the sum-to-65536 /
    min-1 invariants hold by construction."""
    deficit = _TOTAL - jnp.sum(freq, axis=axis, keepdims=True)
    amax = jnp.argmax(freq, axis=axis, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, freq.shape, axis)
    return freq + jnp.where(iota == amax, deficit, 0)


def det_freq_rows(pmf, qscale, axis: int):
    """Quantization tail shared by both backends: freq = max(floor(
    pmf*qscale), 1) with the deficit stolen by the FIRST max bin.

    The single float->int boundary (floor of the transcendental chain)
    is pinned behind an optimization_barrier: XLA:CPU otherwise
    rematerializes the float chain into each integer consumer with
    different FMA contraction, so deficit and argmax would derive from
    *different* freq copies and silently break the sum invariant
    (measured, r4).  Everything after the barrier is integer and
    recomputation-safe (det_steal)."""
    freq = jnp.maximum(jnp.floor(pmf * qscale),
                       jnp.float32(1.0)).astype(jnp.int32)
    return det_steal(jax.lax.optimization_barrier(freq), axis)
