"""Pallas TPU kernels for the interleaved-lane rANS grid coder.

Same integer algorithm as ``device_rans.rans_encode_grid`` /
``rans_decode_grid`` (bit-identical streams — everything is integer
arithmetic), but run as a single Mosaic kernel instead of a
``lax.scan``: the per-step XLA dispatch overhead (~0.4 ms/step measured,
x192 steps) disappears, lane states live in VMEM scratch across grid
steps, and the frequency rows stream through VMEM with the built-in
block pipeline.

Layout contract (matches models/hesic_fast.py):
  freq   (B, M, S, hw) int32 — quantized frequency rows, lane layout
  sym    (M, B, 1, hw) int32 — grid symbols in [0, S)
  words  (B, C, hw)    int32 — per-lane u16 word buffers (decode input,
                               word-position-major so the per-lane word
                               fetch is a masked reduction)
  states (B, 1, hw)    uint32, counts (B, 1, hw) int32

Mosaic requires the last two dims of every block to be (8-, 128-)
divisible or equal to the full array dims; the singleton axes above park
the full (possibly unaligned) dims last so only leading axes are
blocked, which keeps the batch-chunk size free to match VMEM.

The grid iterates (batch-chunk, M) with M fastest; the TPU grid is
sequential, so VMEM scratch carries each lane's rANS state across the M
steps of its chunk.  Encode walks M in reverse (rANS encodes backwards)
via reversed index maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PROB_BITS = 16
_TOTAL = 1 << PROB_BITS
# plain ints: weak typing keeps uint32 semantics, and module-level jnp
# constants would be captured by the kernel (pallas rejects that)
_RANS_L = 1 << 16
_U16 = 0xFFFF

# VMEM budget for picking the batch-chunk size (bytes); the freq block is
# double-buffered by the pipeline, the words block is fetched once per
# chunk.  Keep well under the ~16 MB/core VMEM.
_VMEM_TARGET = 6 * 1024 * 1024


def _pick_chunk(b: int, s: int, hw: int, c: int = 0) -> int:
    """Largest divisor of b whose working set fits the VMEM budget."""
    per_row = (2 * s + 2 * c + 8) * hw * 4  # freq x2 (+ words x2) + temps
    bc = min(max(1, _VMEM_TARGET // max(per_row, 1)), b)
    while b % bc:
        bc -= 1
    return bc


def _enc_kernel(freq_ref, sym_ref, words_ref, counts_ref, states_ref,
                x_s, p_s):
    m = pl.program_id(1)
    n_m = pl.num_programs(1)

    @pl.when(m == 0)
    def _():
        x_s[...] = jnp.full(x_s.shape, _RANS_L, jnp.uint32)
        p_s[...] = jnp.zeros(p_s.shape, jnp.int32)
        words_ref[...] = jnp.zeros(words_ref.shape, jnp.int32)

    f_all = freq_ref[:, 0]                     # (Bc, S, hw)
    sym = sym_ref[0]                           # (Bc, 1, hw)
    iota = jax.lax.broadcasted_iota(jnp.int32, f_all.shape, 1)
    start = jnp.sum(f_all * (iota < sym), axis=1).astype(jnp.uint32)
    f = jnp.sum(f_all * (iota == sym), axis=1).astype(jnp.uint32)

    x = x_s[...]
    need = x >= (f << PROB_BITS)
    word = (x & _U16).astype(jnp.int32)
    x = jnp.where(need, x >> PROB_BITS, x)
    # q = x // f via f32-reciprocal multiply; the +-1 correction makes the
    # integer result exact (q <= 2^16), identical to device_rans.
    # Mosaic has no uint32<->f32 casts: build x_f from exact 16-bit halves
    # (hi*2^16 + lo rounds once — identical to a direct u32->f32 cast),
    # and route small values through int32.
    f_f = (f & _U16).astype(jnp.int32).astype(jnp.float32)
    rcp = 1.0 / f_f
    x_f = ((x >> PROB_BITS).astype(jnp.int32).astype(jnp.float32)
           * float(1 << PROB_BITS)
           + (x & _U16).astype(jnp.int32).astype(jnp.float32))
    # clamp in int32 (Mosaic cannot legalize unsigned min)
    q = jnp.minimum((x_f * rcp).astype(jnp.int32),
                    jnp.int32(_U16)).astype(jnp.uint32)
    q = jnp.where(q * f > x, q - 1, q)
    r = x - q * f
    fix = r >= f
    q = jnp.where(fix, q + 1, q)
    r = jnp.where(fix, r - f, r)
    x_s[...] = (q << PROB_BITS) + r + start

    # in-kernel compaction: each lane appends its word at its own write
    # pointer via a one-hot masked accumulate over the cap axis (the XLA
    # alternative — a (M, B*hw) scatter after the fact — measured tens of
    # ms per stream)
    p = p_s[...]                               # (Bc, hw)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, words_ref.shape, 1)
    hit = (iota_c == p[:, None, :]) & need[:, None, :]
    words_ref[...] = jnp.where(hit, word[:, None, :], words_ref[...])
    p_s[...] = p + need.astype(jnp.int32)

    @pl.when(m == n_m - 1)
    def _():
        counts_ref[...] = p_s[...][:, None, :]
        states_ref[...] = x_s[...][:, None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def rans_encode_grid_pallas(freq, sym_mbl, interpret: bool = False):
    """freq (B, M, S, hw) int32, sym_mbl (M, B, hw) int32 ->
    (words (B, CAP, hw) int32 [u16 values, per-lane compacted, CAP = M+2],
    counts (B, hw) int32, states (B, hw) uint32).

    Word order per lane matches device_rans.compact_words: emission order
    (decreasing m), i.e. the decoder reads backwards from counts-1."""
    b, m, s, hw = freq.shape
    cap = m + 2
    bc = _pick_chunk(b, s, hw, cap)
    grid = (b // bc, m)
    words, counts, states = pl.pallas_call(
        _enc_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, 1, s, hw), lambda i, j: (i, m - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, 1, hw), lambda i, j: (m - 1 - j, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bc, cap, hw), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, hw), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, hw), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cap, hw), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, hw), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, hw), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((bc, hw), jnp.uint32),
                        pltpu.VMEM((bc, hw), jnp.int32)],
        interpret=interpret,
    )(freq.astype(jnp.int32),
      sym_mbl.astype(jnp.int32).reshape(m, b, 1, hw))
    return (words, counts.reshape(b, hw), states.reshape(b, hw))


def _dec_kernel(freq_ref, words_ref, counts_ref, states_ref, out_ref,
                x_s, p_s):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        x_s[...] = states_ref[:, 0]
        p_s[...] = counts_ref[:, 0]

    f_all = freq_ref[:, 0]                     # (Bc, S, hw)
    # inclusive CDF via Hillis-Steele doubling (Mosaic has no cumsum):
    # log2(S) rounds of roll-and-masked-add along the S (sublane) axis
    s_dim = f_all.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, f_all.shape, 1)
    c = f_all
    d = 1
    while d < s_dim:
        c = c + jnp.where(row >= d, pltpu.roll(c, d, axis=1), 0)
        d *= 2
    x = x_s[...]
    cf = (x & _U16).astype(jnp.int32)          # (Bc, hw)
    le = c <= cf[:, None, :]
    sym = jnp.sum(le.astype(jnp.int32), axis=1)
    start_i = jnp.max(c * le.astype(jnp.int32), axis=1)
    nxt = jnp.min(jnp.where(le, jnp.int32(_TOTAL), c), axis=1)
    start = start_i.astype(jnp.uint32)
    fr = (nxt - start_i).astype(jnp.uint32)
    x_new = fr * (x >> PROB_BITS) + cf.astype(jnp.uint32) - start

    need = x_new < _RANS_L
    p = p_s[...]
    p_read = jnp.maximum(p - 1, 0)
    w = words_ref[...]                         # (Bc, C, hw)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    word = jnp.sum(jnp.where(iota_c == p_read[:, None, :], w, 0),
                   axis=1).astype(jnp.uint32)
    x_s[...] = jnp.where(need, (x_new << PROB_BITS) | word, x_new)
    p_s[...] = jnp.where(need, p - 1, p)
    out_ref[0] = sym[:, None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def rans_decode_grid_pallas(freq, words, counts, states,
                            interpret: bool = False):
    """freq (B, M, S, hw) int32, words (B, C, hw) int32 [u16 values],
    counts (B, hw) int32, states (B, hw) uint32 -> syms (M, B, hw)."""
    b, m, s, hw = freq.shape
    c_cap = words.shape[1]
    bc = _pick_chunk(b, s, hw, c_cap)
    grid = (b // bc, m)
    syms = pl.pallas_call(
        _dec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, 1, s, hw), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, c_cap, hw), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, hw), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, hw), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bc, 1, hw), lambda i, j: (j, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, b, 1, hw), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bc, hw), jnp.uint32),
            pltpu.VMEM((bc, hw), jnp.int32),
        ],
        interpret=interpret,
    )(freq.astype(jnp.int32), words.astype(jnp.int32),
      counts.astype(jnp.int32).reshape(b, 1, hw),
      states.astype(jnp.uint32).reshape(b, 1, hw))
    return syms.reshape(m, b, hw)
