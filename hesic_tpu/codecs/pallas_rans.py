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
  words  (B, C, ls)    int32 — per-lane u16 word buffers (decode input,
                               word-position-major so the per-lane word
                               fetch is a masked reduction)
  states (B, 1, ls)    uint32, counts (B, 1, ls) int32

``ppl`` (positions per lane) folds several spatial positions into one
rANS lane: lane λ ∈ [0, ls), ls = hw // ppl, codes positions
j*ls + λ for j = 0..ppl-1 as consecutive micro-steps of each channel
step (decode ascending j, encode descending).  Fewer lanes divide the
container's per-lane overhead (6 B: count + state) by ppl — the r2
fast-container rate tax — while the VPU stays saturated because the
batch dimension rides in the same block.  ls must stay a multiple of
128 (lane-slice alignment), which the caller guarantees.

Mosaic requires the last two dims of every block to be (8-, 128-)
divisible or equal to the full array dims; the singleton axes above park
the full (possibly unaligned) dims last so only leading axes are
blocked, which keeps the batch-chunk size free to match VMEM.

The grid iterates (batch-chunk, M*ppl) with the flattened (m, j)
micro-step index fastest; the TPU grid is sequential, so VMEM scratch
carries each lane's rANS state across the steps of its chunk.  Encode
walks m and j in reverse (rANS encodes backwards) via reversed index
maps.  The per-j hw slice is taken by the BlockSpec (hw blocked into
ppl slices of ls lanes), NOT by in-kernel lane slicing: a lane-dim
slice leaves a non-zero lane offset in the operand layout, and Mosaic
cannot broadcast such operands along the sublane axis ("Invalid input
layout").

With ppl > 1 the encoder's per-lane word capacity is a caller-supplied
budget (the guaranteed bound M*ppl+2 would blow VMEM); the caller must
check the returned counts for overflow (count > cap ⇒ words truncated)
and retry with a larger cap — hesic_fast does this on the counts sync
it already performs.
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


def _pick_chunk(b: int, s: int, hw: int, ls: int, c: int = 0) -> int:
    """Largest divisor of b whose working set fits the VMEM budget."""
    per_row = (2 * s + 8) * hw * 4 + 2 * c * ls * 4
    bc = min(max(1, _VMEM_TARGET // max(per_row, 1)), b)
    while b % bc:
        bc -= 1
    return bc


def _enc_step(f_all, sym, x, p, words_ref, iota_c):
    """One rANS encode transition on (Bc, S, ls) freq rows; returns
    updated (x, p) and writes compacted words in place."""
    iota = jax.lax.broadcasted_iota(jnp.int32, f_all.shape, 1)
    start = jnp.sum(f_all * (iota < sym), axis=1).astype(jnp.uint32)
    f = jnp.sum(f_all * (iota == sym), axis=1).astype(jnp.uint32)

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
    x = (q << PROB_BITS) + r + start

    # in-kernel compaction: each lane appends its word at its own write
    # pointer via a one-hot masked accumulate over the cap axis (the XLA
    # alternative — a (M, B*hw) scatter after the fact — measured tens of
    # ms per stream)
    hit = (iota_c == p[:, None, :]) & need[:, None, :]
    words_ref[...] = jnp.where(hit, word[:, None, :], words_ref[...])
    p = p + need.astype(jnp.int32)
    return x, p


def _enc_kernel(freq_ref, sym_ref, words_ref, counts_ref, states_ref,
                x_s, p_s):
    step = pl.program_id(1)
    n_steps = pl.num_programs(1)

    @pl.when(step == 0)
    def _():
        x_s[...] = jnp.full(x_s.shape, _RANS_L, jnp.uint32)
        p_s[...] = jnp.zeros(p_s.shape, jnp.int32)
        words_ref[...] = jnp.zeros(words_ref.shape, jnp.int32)

    # The (m, j) micro-step walk lives entirely in the BlockSpec index
    # maps (grid axis 1 = m*ppl, m and j both descending): each step sees
    # one (Bc, S, ls) freq block and (Bc, 1, ls) symbol block with a
    # ZERO lane offset.  In-kernel lane slices (f4[:, :, j*ls:...]) leave
    # a non-zero lane offset in the operand layout, and Mosaic cannot
    # broadcast such an operand along the sublane (S) axis — "Invalid
    # input layout" at compile.
    f_all = freq_ref[:, 0]                     # (Bc, S, ls)
    sym = sym_ref[0]                           # (Bc, 1, ls)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, words_ref.shape, 1)
    x, p = _enc_step(f_all, sym, x_s[...], p_s[...], words_ref, iota_c)
    x_s[...] = x
    p_s[...] = p

    @pl.when(step == n_steps - 1)
    def _():
        counts_ref[...] = p_s[...][:, None, :]
        states_ref[...] = x_s[...][:, None, :]


@functools.partial(jax.jit, static_argnames=("ppl", "cap", "interpret"))
def rans_encode_grid_pallas(freq, sym_mbl, ppl: int = 1, cap: int = None,
                            interpret: bool = False):
    """freq (B, M, S, hw) int32, sym_mbl (M, B, hw) int32 ->
    (words (B, CAP, ls) int32 [u16 values, per-lane compacted],
    counts (B, ls) int32, states (B, ls) uint32), ls = hw // ppl.

    Word order per lane matches device_rans.compact_words: emission order
    (decreasing step), i.e. the decoder reads backwards from counts-1.
    With ppl == 1, CAP defaults to the guaranteed bound M+2; with
    ppl > 1 the caller passes a budget and must check counts <= CAP."""
    b, m, s, hw = freq.shape
    ls = hw // ppl
    if cap is None:
        cap = m + 2 if ppl == 1 else m * ppl + 2
    bc = _pick_chunk(b, s, ls, ls, cap)
    # grid axis 1 runs the (m, j) micro-steps flattened, both descending
    # (rANS encodes backwards); the hw axis is blocked into ppl slices of
    # ls lanes so each block lands with lane offset 0 (see _enc_kernel).
    grid = (b // bc, m * ppl)
    words, counts, states = pl.pallas_call(
        _enc_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, 1, s, ls),
                         lambda i, t: (i, m - 1 - t // ppl, 0,
                                       ppl - 1 - t % ppl),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, 1, ls),
                         lambda i, t: (m - 1 - t // ppl, i, 0,
                                       ppl - 1 - t % ppl),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bc, cap, ls), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, ls), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, ls), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cap, ls), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, ls), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, ls), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((bc, ls), jnp.uint32),
                        pltpu.VMEM((bc, ls), jnp.int32)],
        interpret=interpret,
    )(freq.astype(jnp.int32),
      sym_mbl.astype(jnp.int32).reshape(m, b, 1, hw))
    return (words, counts.reshape(b, ls), states.reshape(b, ls))


def _dec_step(f_all, x, p, w, iota_c):
    """One rANS decode transition on (Bc, S, ls) freq rows; returns
    (sym, x, p)."""
    s_dim = f_all.shape[1]
    # inclusive CDF via Hillis-Steele doubling (Mosaic has no cumsum):
    # log2(S) rounds of roll-and-masked-add along the S (sublane) axis
    row = jax.lax.broadcasted_iota(jnp.int32, f_all.shape, 1)
    c = f_all
    d = 1
    while d < s_dim:
        c = c + jnp.where(row >= d, pltpu.roll(c, d, axis=1), 0)
        d *= 2
    cf = (x & _U16).astype(jnp.int32)          # (Bc, ls)
    le = c <= cf[:, None, :]
    sym = jnp.sum(le.astype(jnp.int32), axis=1)
    start_i = jnp.max(c * le.astype(jnp.int32), axis=1)
    nxt = jnp.min(jnp.where(le, jnp.int32(_TOTAL), c), axis=1)
    start = start_i.astype(jnp.uint32)
    fr = (nxt - start_i).astype(jnp.uint32)
    x_new = fr * (x >> PROB_BITS) + cf.astype(jnp.uint32) - start

    need = x_new < _RANS_L
    p_read = jnp.maximum(p - 1, 0)
    word = jnp.sum(jnp.where(iota_c == p_read[:, None, :], w, 0),
                   axis=1).astype(jnp.uint32)
    x = jnp.where(need, (x_new << PROB_BITS) | word, x_new)
    p = jnp.where(need, p - 1, p)
    return sym, x, p


def _dec_kernel(freq_ref, words_ref, counts_ref, states_ref, out_ref,
                x_s, p_s):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        x_s[...] = states_ref[:, 0]
        p_s[...] = counts_ref[:, 0]

    # (m, j) micro-steps flattened on grid axis 1, both ascending; the
    # block pipeline delivers zero-lane-offset (Bc, S, ls) freq blocks
    # (see _enc_kernel for why in-kernel lane slices cannot be used).
    f_all = freq_ref[:, 0]                     # (Bc, S, ls)
    w = words_ref[...]                         # (Bc, C, ls)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    sym, x, p = _dec_step(f_all, x_s[...], p_s[...], w, iota_c)
    out_ref[0] = sym[:, None, :]
    x_s[...] = x
    p_s[...] = p


@functools.partial(jax.jit, static_argnames=("ppl", "interpret"))
def rans_decode_grid_pallas(freq, words, counts, states, ppl: int = 1,
                            interpret: bool = False):
    """freq (B, M, S, hw) int32, words (B, C, ls) int32 [u16 values],
    counts (B, ls) int32, states (B, ls) uint32 -> syms (M, B, hw)."""
    b, m, s, hw = freq.shape
    ls = hw // ppl
    c_cap = words.shape[1]
    bc = _pick_chunk(b, s, ls, ls, c_cap)
    grid = (b // bc, m * ppl)
    syms = pl.pallas_call(
        _dec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, 1, s, ls),
                         lambda i, t: (i, t // ppl, 0, t % ppl),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, c_cap, ls), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, ls), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, ls), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bc, 1, ls),
                               lambda i, t: (t // ppl, i, 0, t % ppl),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, b, 1, hw), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bc, ls), jnp.uint32),
            pltpu.VMEM((bc, ls), jnp.int32),
        ],
        interpret=interpret,
    )(freq.astype(jnp.int32), words.astype(jnp.int32),
      counts.astype(jnp.int32).reshape(b, 1, ls),
      states.astype(jnp.uint32).reshape(b, 1, ls))
    return syms.reshape(m, b, hw)


# ---------------------------------------------------------------------------
# slot-stream pairs encoder: encode precomputed (start, freq) intervals
# ---------------------------------------------------------------------------

def _pairs_enc_kernel(start_ref, freq_ref, valid_ref, words_ref,
                      counts_ref, states_ref, x_s, p_s):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        x_s[...] = jnp.full(x_s.shape, _RANS_L, jnp.uint32)
        p_s[...] = jnp.zeros(p_s.shape, jnp.int32)
        words_ref[...] = jnp.zeros(words_ref.shape, jnp.int32)

    start = start_ref[0].astype(jnp.uint32)            # (8, L8)
    valid = valid_ref[0] != 0
    x0 = x_s[...]
    p0 = p_s[...]

    # clamp invalid lanes' freq in int32 (Mosaic cannot legalize maxui)
    f_safe = jnp.maximum(freq_ref[0], 1).astype(jnp.uint32)
    need = x0 >= (f_safe << PROB_BITS)
    word = (x0 & _U16).astype(jnp.int32)
    x = jnp.where(need, x0 >> PROB_BITS, x0)
    f_f = (f_safe & _U16).astype(jnp.int32).astype(jnp.float32)
    rcp = 1.0 / f_f
    x_f = ((x >> PROB_BITS).astype(jnp.int32).astype(jnp.float32)
           * float(1 << PROB_BITS)
           + (x & _U16).astype(jnp.int32).astype(jnp.float32))
    q = jnp.minimum((x_f * rcp).astype(jnp.int32),
                    jnp.int32(_U16)).astype(jnp.uint32)
    q = jnp.where(q * f_safe > x, q - 1, q)
    r = x - q * f_safe
    fix = r >= f_safe
    q = jnp.where(fix, q + 1, q)
    r = jnp.where(fix, r - f_safe, r)
    x_new = (q << PROB_BITS) + r + start

    need = need & valid
    iota_c = jax.lax.broadcasted_iota(jnp.int32, words_ref.shape, 1)
    hit = (iota_c == p0[:, None, :]) & need[:, None, :]
    words_ref[...] = jnp.where(hit, word[:, None, :], words_ref[...])
    x_s[...] = jnp.where(valid, x_new, x0)
    p_s[...] = p0 + need.astype(jnp.int32)

    @pl.when(t == n_t - 1)
    def _():
        counts_ref[...] = p_s[...]
        states_ref[...] = x_s[...]


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def rans_encode_pairs_pallas(starts, freqs, valid, cap: int = 256,
                             interpret: bool = False):
    """Mosaic replacement for device_rans.rans_encode_grid: encode
    precomputed per-slot (start, freq) intervals over T sequential slots
    of L interleaved lanes (the wavefront AR codec's slot stream — the
    lax.scan version measured ~1.1 s for T=1000 on the tunnel).

    starts/freqs: (T, L) uint32/int32; valid: (T, L) bool.
    Returns (words (L, cap) int32 [u16 values, emission order],
    counts (L,) int32, states (L,) uint32) — bit-identical to
    rans_encode_grid.  `cap` is a word budget per lane; the caller must
    check counts <= cap and retry bigger on overflow."""
    t_dim, l_dim = starts.shape
    l8 = -(-l_dim // 8)
    pad = 8 * l8 - l_dim

    def shape2(a, fill=0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((t_dim, pad), fill, a.dtype)], axis=1)
        return a.reshape(t_dim, 8, l8)

    words, counts, states = pl.pallas_call(
        _pairs_enc_kernel,
        grid=(t_dim,),
        in_specs=[
            pl.BlockSpec((1, 8, l8), lambda t: (t_dim - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, l8), lambda t: (t_dim - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, l8), lambda t: (t_dim - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, cap, l8), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, l8), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, l8), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, cap, l8), jnp.int32),
            jax.ShapeDtypeStruct((8, l8), jnp.int32),
            jax.ShapeDtypeStruct((8, l8), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((8, l8), jnp.uint32),
                        pltpu.VMEM((8, l8), jnp.int32)],
        interpret=interpret,
    )(shape2(starts.astype(jnp.int32)),
      shape2(freqs.astype(jnp.int32)),
      shape2(valid.astype(jnp.int32)))
    words = words.transpose(1, 0, 2).reshape(cap, 8 * l8)[:, :l_dim].T
    return (words, counts.reshape(-1)[:l_dim],
            states.reshape(-1)[:l_dim])
