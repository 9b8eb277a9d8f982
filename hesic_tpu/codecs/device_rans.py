"""Vectorized rANS entropy coding ON the TPU (interleaved lanes).

Why: the host link is the bottleneck (~35 MB/s d2h, ~27 ms per synchronous
dispatch on this setup).  Shipping per-pixel CDF tables to a host coder
(as the reference does implicitly by running everything on the host,
newnet1.py:916-1044) costs hundreds of ms per image.  Instead the whole
codec loop runs as device tensor ops: L independent rANS streams advance
in lockstep inside a ``lax.scan``, so only the compressed bytes ever cross
the PCIe/tunnel boundary — and the decoded latents never leave the chip.

Coder: rANS with 32-bit state, 16-bit probability resolution, 16-bit word
renormalization.  State invariant x in [2^16, 2^32); each symbol emits at
most one u16 word.  Symbols are assigned round-robin to lanes
(symbol i -> lane i % L, slot i // L); each lane encodes its slots in
reverse and the decoder replays them forward, reading its word stream
backward — so no buffer reversal is ever needed.

Stream format (per tensor): per-lane word counts (u16[L]) + final states
(u32[L]) + concatenated per-lane u16 words.  The per-lane flush overhead
is 4 bytes; L trades scan depth against rate overhead.

CDF convention: integer rows summing to exactly 2^16 with no zero bins,
built on device by ``quantize_pmf_device`` (floor + clamp-to-1 + dump the
residual on the largest bin).  This replaces the reference's
arbitrary-total clip/round scheme (newnet1.py:975-978) — self-consistent
bitstreams, equivalent rate, power-of-two totals for rANS.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PROB_BITS = 16
RANS_L = jnp.uint32(1 << 16)
_TOTAL = 1 << PROB_BITS


def quantize_pmf_device(pmf, axis: int = -1):
    """Float PMF rows -> integer frequency rows summing to 2^16, bins >= 1.

    pmf: float32 with the symbol axis at `axis` (need not be normalized).
    Fully vectorized; keep a 128-multiple dimension minor for TPU lane
    alignment and put the (usually short) symbol axis elsewhere.
    """
    pmf = jnp.asarray(pmf, jnp.float32)
    axis = axis % pmf.ndim
    pmf = jnp.maximum(pmf, 0.0)
    total = jnp.sum(pmf, axis=axis, keepdims=True)
    ideal = pmf / jnp.maximum(total, 1e-30) * _TOTAL
    freq = jnp.clip(jnp.floor(ideal), 1, None).astype(jnp.int32)
    deficit = _TOTAL - jnp.sum(freq, axis=axis, keepdims=True)
    amax = jnp.argmax(freq, axis=axis, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, pmf.shape, axis)
    onehot = (iota == amax).astype(jnp.int32)
    return freq + onehot * deficit


def freq_to_cdf(freq, axis: int = -1):
    """Freq rows -> CDF rows (leading zero) along `axis`."""
    axis = axis % freq.ndim
    c = jnp.cumsum(freq, axis=axis)
    zshape = list(c.shape)
    zshape[axis] = 1
    return jnp.concatenate(
        [jnp.zeros(zshape, c.dtype), c], axis=axis)


def _pad_to_grid(n: int, lanes: int):
    t = -(-n // lanes)
    return t, t * lanes - n


def rans_encode_grid(starts, freqs, valid):
    """Encode a (T, L) grid of intervals; all L lanes advance in lockstep.

    starts/freqs: (T, L) uint32; valid: (T, L) bool (False slots skipped).
    Returns (words (L, T+2) int32 [u16 values], counts (L,), states (L,)).

    TPU notes: the scan carries only the (L,) lane states — emitted words
    stream out as stacked scan outputs and are compacted into per-lane
    buffers with ONE scatter afterwards.  The u32 division in the rANS
    transition runs as an f32-reciprocal multiply with a +-1 integer
    correction (q <= 2^16, so one correction step is exact) — hardware
    integer division is much slower on the VPU.
    """
    t_steps, lanes = starts.shape
    recips = 1.0 / freqs.astype(jnp.float32)

    def step(x, inputs):
        s, f, rcp, v = inputs
        # renormalize: emit low 16 bits when x >= f << 16
        need = v & (x >= (f << PROB_BITS))
        word = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
        x = jnp.where(need, x >> PROB_BITS, x)
        # q = x // f via reciprocal multiply (+-1 correction)
        q = jnp.minimum(
            (x.astype(jnp.float32) * rcp).astype(jnp.uint32),
            jnp.uint32(0xFFFF))
        q = jnp.where(q * f > x, q - 1, q)
        r = x - q * f
        fix = r >= f
        q = jnp.where(fix, q + 1, q)
        r = jnp.where(fix, r - f, r)
        x_new = (q << PROB_BITS) + r + s
        x = jnp.where(v, x_new, x)
        return x, (word, need)

    init = jnp.full((lanes,), RANS_L, jnp.uint32)
    # unroll: per-step work is tiny relative to scan-iteration dispatch
    # overhead, so fusing 8 steps per loop iteration is a large win
    states, (words_t, need_t) = jax.lax.scan(
        step, init, (starts, freqs, recips, valid), reverse=True,
        unroll=8 if t_steps % 8 == 0 else 1)

    buf, counts = compact_words(words_t, need_t)
    return buf, counts, states


def compact_words(words_t, need_t):
    """Compact per-step emissions (T, L) into per-lane buffers (L, T+2).

    Emission order is decreasing t, so position of step t's word is the
    number of emissions at steps > t.
    """
    t_steps, lanes = words_t.shape
    need_i = need_t.astype(jnp.int32)
    counts = jnp.sum(need_i, axis=0)                      # (L,)
    incl = jnp.cumsum(need_i, axis=0)                     # (T, L)
    pos = counts[None, :] - incl                          # (T, L)
    cap = t_steps + 2
    lane_ids = jnp.broadcast_to(jnp.arange(lanes)[None, :],
                                pos.shape)
    pos_safe = jnp.where(need_i != 0, pos, cap)           # dump slot
    buf = jnp.zeros((lanes, cap + 1), jnp.int32)
    buf = buf.at[lane_ids, pos_safe].set(words_t, mode="drop")
    return buf[:, :cap], counts


def grid_from_flat(arr, lanes: int, fill):
    """(n,) -> ((T, L), valid (T, L)) with round-robin lane assignment."""
    n = arr.shape[0]
    t_steps, pad = _pad_to_grid(n, lanes)
    arr = jnp.concatenate(
        [arr, jnp.full((pad,), fill, arr.dtype)])
    valid = (jnp.arange(t_steps * lanes) < n).reshape(t_steps, lanes)
    return arr.reshape(t_steps, lanes), valid


@partial(jax.jit, static_argnums=(2,))
def rans_encode_interleaved(starts, freqs, lanes: int):
    """Encode n symbols given per-symbol (start, freq) intervals.

    starts/freqs: (n,) int32 with freq >= 1, start+freq <= 2^16.
    Returns (words (L, T+2) int32 [u16 values], counts (L,) int32,
    states (L,) uint32).  Padding slots are skipped via masking.
    """
    s_grid, valid = grid_from_flat(starts.astype(jnp.uint32), lanes,
                                   jnp.uint32(0))
    f_grid, _ = grid_from_flat(freqs.astype(jnp.uint32), lanes,
                               jnp.uint32(1))
    return rans_encode_grid(s_grid, f_grid, valid)


def rans_decode_grid(words, counts, states, rows, valid):
    """Decode a (T, L) grid from per-lane word buffers.

    words: (L, C) int32 u16 values; counts/states: (L,);
    rows: (T, S+1, L) int32 CDF rows (S-major so the lane axis stays
    128-aligned); valid: (T, L).  Returns symbols (T, L) int32.

    TPU notes: the symbol search is S+1 vectorized compares + reductions
    along the sublane axis — no gathers; start/freq come from masked
    max/min over the monotone CDF instead of take_along_axis.
    """
    t_steps, lanes = valid.shape
    lane_ids = jnp.arange(lanes)

    def step(carry, inputs):
        x, p = carry
        row, v = inputs  # (S+1, L), (L,)
        cf = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
        le = row <= cf[None, :]                       # (S+1, L)
        sym = jnp.sum(le[1:].astype(jnp.int32), axis=0)
        start_i = jnp.max(row * le.astype(jnp.int32), axis=0)
        nxt = jnp.min(jnp.where(le, jnp.int32(_TOTAL), row), axis=0)
        start = start_i.astype(jnp.uint32)
        freq = (nxt - start_i).astype(jnp.uint32)
        x_new = freq * (x >> PROB_BITS) + cf.astype(jnp.uint32) - start
        # renormalize: pull one u16 word when x < 2^16
        need = v & (x_new < RANS_L)
        p_read = jnp.maximum(p - 1, 0)
        word = words[lane_ids, p_read].astype(jnp.uint32)
        x_new = jnp.where(need, (x_new << PROB_BITS) | word, x_new)
        p = jnp.where(need, p - 1, p)
        x = jnp.where(v, x_new, x)
        return (x, p), jnp.where(v, sym, 0)

    init = (states.astype(jnp.uint32), counts.astype(jnp.int32))
    (_, _), syms = jax.lax.scan(step, init, (rows, valid),
                                unroll=8 if t_steps % 8 == 0 else 1)
    return syms


@partial(jax.jit, static_argnums=(4, 5))
def rans_decode_interleaved(words, counts, states, cdf_rows, n: int,
                            lanes: int):
    """Decode n symbols whose CDF rows are known on device.

    words: (L, C) int32 u16 values; counts: (L,); states: (L,) uint32;
    cdf_rows: (n_padded >= n, S+1) int32 rows summing to 2^16 (row i is
    symbol i's CDF).  Returns symbols (n,) int32.
    """
    t_steps, pad = _pad_to_grid(n, lanes)
    s1 = cdf_rows.shape[-1]
    rows = jnp.concatenate(
        [cdf_rows[:n], jnp.tile(cdf_rows[:1], (pad, 1))], axis=0)
    rows = rows.reshape(t_steps, lanes, s1).transpose(0, 2, 1)  # (T,S+1,L)
    valid = (jnp.arange(t_steps * lanes) < n).reshape(t_steps, lanes)
    syms = rans_decode_grid(words, counts, states, rows, valid)
    return syms.reshape(-1)[:n]


def gather_intervals(cdf_rows, symbols):
    """Per-symbol (start, freq) from CDF rows — device gather.

    cdf_rows: (n, S+1) int32; symbols: (n,) int32 in [0, S-1].
    """
    sym = symbols[:, None]
    start = jnp.take_along_axis(cdf_rows, sym, axis=-1)[:, 0]
    hi = jnp.take_along_axis(cdf_rows, sym + 1, axis=-1)[:, 0]
    return start, hi - start


def intervals_from_freq(freq, symbols):
    """Per-symbol (start, freq) straight from frequency rows, gather-free.

    freq: (..., S) int32 quantized frequencies; symbols: (...,) int32.
    start = sum of frequencies below the symbol; masked reductions
    vectorize better than row gathers inside large fused TPU programs.
    """
    s = freq.shape[-1]
    iota = jnp.arange(s, dtype=jnp.int32)
    sym = symbols[..., None]
    start = jnp.sum(freq * (iota < sym), axis=-1)
    f = jnp.sum(freq * (iota == sym), axis=-1)
    return start, f


# ---------------------------------------------------------------------------
# host-side container packing
# ---------------------------------------------------------------------------

def pack_counts(counts) -> bytes:
    """Per-lane word counts, delta-coded: u8 mode | mode 1: u16 base +
    u8 deltas[L] (counts cluster tightly around the mean; spread < 256
    in practice) | mode 0 fallback: u16 counts[L]."""
    counts = np.asarray(counts, np.int64)
    base = int(counts.min())
    if counts.size and int(counts.max()) - base < 256 and base <= 0xFFFF:
        return (b"\x01" + np.uint16(base).tobytes()
                + (counts - base).astype(np.uint8).tobytes())
    return b"\x00" + counts.astype(np.uint16).tobytes()


def unpack_counts(blob: bytes, offset: int, lanes: int):
    mode = blob[offset]
    offset += 1
    if mode == 1:
        base = int(np.frombuffer(blob, np.uint16, 1, offset)[0])
        offset += 2
        counts = base + np.frombuffer(blob, np.uint8, lanes,
                                      offset).astype(np.int32)
        offset += lanes
    else:
        counts = np.frombuffer(blob, np.uint16, lanes,
                               offset).astype(np.int32)
        offset += 2 * lanes
    return counts, offset


# Padded word buffers smaller than this cross the link as-is: the
# device-side compact/expand programs each cost a synchronous dispatch
# (~27 ms through the axon tunnel), which only pays for itself once the
# padding waste exceeds a couple of MB (measured: HESIC+ batch-11 6 MB
# padded / 0.7 MB dense -> +9 pairs/s; mbt2018 batch-11 0.6 MB padded
# -> the two extra dispatches LOST ~7 img/s).
DENSE_LINK_THRESHOLD = int(
    os.environ.get("HESIC_DENSE_LINK_THRESHOLD", str(2 << 20)))


def pack_stream_auto(words_dev, counts, states) -> bytes:
    """Serialize an interleaved stream from a DEVICE word buffer,
    picking the cheaper link strategy: device compaction + dense fetch
    for large padded buffers, plain padded fetch otherwise.  Bytes are
    identical either way (== ``pack_stream``)."""
    lanes, cap = words_dev.shape
    if lanes * cap * 4 > DENSE_LINK_THRESHOLD:
        bucket = pow2_bucket(int(counts.sum()))
        flat = np.asarray(compact_stream(
            words_dev, jnp.asarray(np.asarray(counts).astype(np.int32)),
            bucket))
        return pack_stream_dense(flat, counts, states)
    return pack_stream(np.asarray(words_dev), counts, states)


def upload_words_auto(flat, counts, cap: int):
    """Inverse link step at decode: build the padded (lanes, cap) int32
    device buffer from a dense u16 payload, expanding ON DEVICE when the
    padded buffer is large (dense upload + gather) and on host
    otherwise (one plain upload, no extra dispatch)."""
    lanes = counts.shape[0]
    if lanes * cap * 4 > DENSE_LINK_THRESHOLD:
        bucket = pow2_bucket(flat.size)
        fp = np.zeros(bucket, np.uint16)
        fp[:flat.size] = flat
        return expand_stream(jnp.asarray(fp),
                             jnp.asarray(counts.astype(np.int32)), cap)
    words = np.zeros((lanes, cap), np.int32)
    mask = np.arange(cap) < counts.astype(np.int64)[:, None]
    words[mask] = flat
    return jnp.asarray(words)


def pow2_bucket(n: int, lo: int = 4096) -> int:
    """Power-of-two size bucket for dense-stream device buffers, so the
    compact/expand programs compile once per bucket (cached) instead of
    once per payload size."""
    b = lo
    while b < n:
        b *= 2
    return b


@partial(jax.jit, static_argnames=("bucket",))
def compact_stream(words, counts, bucket: int):
    """Device-side compaction of a padded (lanes, cap) word buffer into
    ONE dense u16 stream (lane-major), so the host link carries the
    payload instead of the padding: the padded int32 fetch measured
    220 ms of a 630 ms HESIC+ batch-11 roundtrip (~6 MB of mostly
    zeros at ~35 MB/s), vs ~0.7 MB dense.

    Exact inverse of ``expand_words``: byte-identical to the
    ``pack_stream`` host masking it replaces.  Formulated as a GATHER
    (searchsorted over the count prefix sums + take), not a scatter —
    XLA lowers TPU scatters without uniqueness guarantees to a serial
    loop."""
    lanes, cap = words.shape
    counts = counts.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    total = cum[lanes - 1]
    k = jnp.arange(bucket, dtype=jnp.int32)
    lane = jnp.minimum(
        jnp.searchsorted(cum, k, side="right").astype(jnp.int32),
        lanes - 1)
    slot = k - (cum[lane] - counts[lane])
    src = lane * cap + jnp.clip(slot, 0, cap - 1)
    vals = jnp.take(words.reshape(-1), src)
    return jnp.where(k < total, vals, 0).astype(jnp.uint16)


@partial(jax.jit, static_argnames=("cap",))
def expand_stream(dense, counts, cap: int):
    """Inverse of ``compact_words`` on device: dense u16 stream ->
    padded (lanes, cap) int32 buffer for the wavefront kernel.  Keeps
    the kernel's input shapes identical to the encode side (the
    shared-executable bit-exactness invariant) while the host link
    carries only the dense payload."""
    counts = counts.astype(jnp.int32)
    lanes = counts.shape[0]
    offs = jnp.cumsum(counts) - counts
    j = jax.lax.broadcasted_iota(jnp.int32, (lanes, cap), 1)
    valid = j < counts[:, None]
    pos = jnp.clip(offs[:, None] + j, 0, dense.shape[0] - 1)
    w = jnp.take(dense, pos.reshape(-1)).reshape(lanes, cap)
    return jnp.where(valid, w.astype(jnp.int32), 0)


def pack_stream_dense(flat, counts, states) -> bytes:
    """pack_stream for an already-compacted payload (device
    ``compact_words`` output, possibly bucket-padded): same bytes as
    ``pack_stream`` on the padded buffer."""
    counts = np.asarray(counts, np.int64)
    states = np.asarray(states, np.uint32)
    lanes = counts.shape[0]
    total = int(counts.sum())
    payload = np.asarray(flat[:total], np.uint16).tobytes()
    return (np.uint16(lanes).tobytes() + pack_counts(counts)
            + states.tobytes() + payload)


def unpack_stream_dense(blob: bytes, offset: int = 0):
    """unpack_stream without the host-side padding: returns
    (flat u16 payload, counts, states, next_offset) for device-side
    ``expand_words``."""
    lanes = int(np.frombuffer(blob, np.uint16, 1, offset)[0])
    offset += 2
    counts, offset = unpack_counts(blob, offset, lanes)
    states = np.frombuffer(blob, np.uint32, lanes, offset).copy()
    offset += 4 * lanes
    total = int(counts.sum())
    flat = np.frombuffer(blob, np.uint16, total, offset).copy()
    offset += 2 * total
    return flat, counts, states, offset


def pack_stream(words, counts, states) -> bytes:
    """Serialize an interleaved stream: u16 L | delta-coded counts |
    u32 states[L] | concatenated u16 words (lane-major, vectorized)."""
    words = np.asarray(words)
    counts = np.asarray(counts, np.int64)
    states = np.asarray(states, np.uint32)
    lanes, cap = words.shape
    mask = np.arange(cap) < counts[:, None]
    payload = words[mask].astype(np.uint16).tobytes()
    return (np.uint16(lanes).tobytes() + pack_counts(counts)
            + states.tobytes() + payload)


def unpack_stream(blob: bytes, offset: int = 0):
    """Inverse of pack_stream.  Returns (words (L, C), counts, states,
    next_offset); words padded to the max lane length."""
    lanes = int(np.frombuffer(blob, np.uint16, 1, offset)[0])
    offset += 2
    counts, offset = unpack_counts(blob, offset, lanes)
    states = np.frombuffer(blob, np.uint32, lanes, offset).copy()
    offset += 4 * lanes
    cap = max(int(counts.max()), 1)
    total = int(counts.sum())
    flat = np.frombuffer(blob, np.uint16, total, offset)
    offset += 2 * total
    words = np.zeros((lanes, cap), np.int32)
    mask = np.arange(cap) < counts[:, None]
    words[mask] = flat
    return words, counts, states, offset
