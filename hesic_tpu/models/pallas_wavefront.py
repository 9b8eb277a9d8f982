"""Pallas (Mosaic) level-scan kernel for the wavefront AR codec.

Replaces ``ar_device.ar_wavefront``'s ``lax.scan`` — whose carry is the
~30 MB skewed buffer pair and whose per-level cost is dominated by HBM
data movement (STATUS r2 gap 2b) — with ONE Mosaic kernel over a
sequential ``grid=(n_levels,)``:

* the context window lives in a 9-column ring buffer in VMEM scratch
  (the 5x5 mask-A taps reach at most 8 skewed columns back: offset
  3*di+dj with di=-2, dj=-2), so per-level HBM traffic drops from the
  full carry to the level's inputs/outputs (~300 KB);
* the rANS lane states persist in VMEM scratch across grid steps, with
  the in-kernel decode transition per channel group (same micro-step
  structure as the scan);
* Φ uses the A&S 7.1.26 erfc (Mosaic has no erf), so the kernel is its
  own stream backend: encode and decode both run THIS kernel and are
  bit-exact against each other (the hesic_fast invariant); streams are
  NOT interchangeable with the lax.scan backend's.

Layout notes (Mosaic block rules: last two dims (8,128)-divisible or
full):

* per-level tensors are (M, R) channel-major with R = B * p_max lanes
  minor — sublane slicing by channel group (Mg multiple of 8) is
  aligned, which a lane-axis channel split would not be;
* level-major inputs/outputs (pre/post/y/corr/starts/freqs) are
  gathered/scattered once in XLA around the kernel (static schedule), so
  the kernel sees one (1, ...) block per grid step via the pipeline;
* matmuls run row-major (R, C) — every channel dim in the mbt2018/HESIC+
  entropy-parameter stacks is a multiple of 128 — and the two outputs
  that feed the coder phase are transposed to (M, R) in-kernel.

Reference recursion being restructured: priors.py:516-607 and
newnet1_joint.py:793-1322 (the per-pixel host loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codecs.pallas_pmf import _std_cdf
from .ar_device import _TAPS, schedule

PROB_BITS = 16
_TOTAL = 1 << PROB_BITS
_RANS_L = 1 << 16
_U16 = 0xFFFF
# taps reach back at most 8 skewed columns (di=-2, dj=-2); with the
# read-before-write order a 9-slot ring keeps cols s-8..s-1 alive while
# level s overwrites the dead col s-9
_RING = 9
_RPAD = 2  # top row padding: di = -2 at lo = 0


def _kernel(teacher_ref, pre_ref, post_ref, ytrue_ref, cmask_ref, cval_ref,
            words_ref, counts_ref, states_ref,
            tapk_ref, ctxb_ref, w0_ref, b0_ref, w1_ref, b1_ref,
            w2_ref, b2_ref,
            starts_ref, freqs_ref, ylv_ref, residlv_ref,
            ybuf, pmf_s, x_s, p_s, symdec_s,
            tapk_v, w0_v, w1_v, w2_v, wsem,
            *, b, p_max, m, mg, groups, mm, hy, wy, rows, wdtype):
    s = pl.program_id(0)
    r_dim = b * p_max
    s_dim = 2 * mm + 1
    teacher = teacher_ref[0, 0] != 0

    @pl.when(s == 0)
    def _init():
        ybuf[...] = jnp.zeros(ybuf.shape, ybuf.dtype)
        x_s[...] = states_ref[...]
        p_s[...] = counts_ref[...]
        # weights live in HBM (memory_space=ANY) and are DMA'd into VMEM
        # scratch exactly ONCE — as pipelined VMEM inputs they would be
        # re-fetched every level (~1 GB of HBM traffic over 125 levels,
        # the dominant per-level cost when measured)
        for i, (src_, dst) in enumerate(((tapk_ref, tapk_v),
                                         (w0_ref, w0_v),
                                         (w1_ref, w1_v),
                                         (w2_ref, w2_v))):
            cp = pltpu.make_async_copy(src_, dst, wsem.at[i])
            cp.start()
            cp.wait()

    # schedule of this level (same integer formulas as ar_device.schedule)
    lo = jnp.maximum(0, (s - (wy - 1) + 2) // 3)
    hi = jnp.minimum(hy - 1, s // 3)
    cnt = hi - lo + 1

    # ---- context taps from the ring buffer ----
    # ybuf is (RING, ROWS, B, M): the dynamically-sliced row axis must be
    # a leading (untiled) dim — Mosaic requires sublane-dim dynamic
    # slices to be provably 8-aligned.  Lane order inside the kernel is
    # therefore r = p * B + b; the wrapper converts to/from the external
    # (b * p_max + p) order.
    # ring slabs are stored in wdtype already (the ONLY consumer is this
    # wdtype matmul, so narrow storage is lossless — and it halves the
    # ring's VMEM footprint under bf16, the term that capped the lane
    # batch at the 16 MB scoped-vmem limit)
    taps = []
    for (di, dj) in _TAPS:
        slot = (s + 3 * di + dj) % _RING
        slab = ybuf[slot, pl.ds(_RPAD + lo + di, p_max), :, :]
        # reshape in f32: Mosaic's layout inference rejects the sublane
        # collapse on bf16 vectors (bf16<->f32 casts are lossless here)
        taps.append(slab.astype(jnp.float32).reshape(r_dim, m))
    feat_ctx = jnp.concatenate(taps, axis=1).astype(wdtype)  # (R, 12M)
    ctx = jnp.dot(feat_ctx, tapk_v[...],
                  preferred_element_type=jnp.float32) + ctxb_ref[...]

    # ---- entropy-parameter MLP (row-major) ----
    parts = [pre_ref[0], ctx]
    if post_ref is not None:
        parts.append(post_ref[0])
    g = jnp.concatenate(parts, axis=1).astype(wdtype)
    g = jax.nn.leaky_relu(jnp.dot(g, w0_v[...],
                                  preferred_element_type=jnp.float32)
                          + b0_ref[...])
    g = jax.nn.leaky_relu(jnp.dot(g.astype(wdtype), w1_v[...],
                                  preferred_element_type=jnp.float32)
                          + b1_ref[...])
    g = jnp.dot(g.astype(wdtype), w2_v[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    gt = jnp.transpose(g)                               # (2M, R)
    scales = jnp.maximum(gt[:m], 0.11)                  # (M, R)
    means = gt[m:]                                      # (M, R)

    # ---- teacher symbols ----
    y_l = ytrue_ref[0]                                  # (M, R) f32
    resid_true = jnp.round(y_l - means).astype(jnp.int32)
    sym_teach = jnp.clip(resid_true, -mm, mm) + mm

    # ---- PMF pass (store + total) ----
    inv_sc = 1.0 / scales
    total = jnp.zeros((m, r_dim), jnp.float32)
    prev = _std_cdf((float(0 - mm) - 0.5) * inv_sc)
    for si in range(1, s_dim + 1):
        cur = _std_cdf((float(si - mm) - 0.5) * inv_sc)
        p_si = jnp.maximum(cur - prev, 0.0)
        pmf_s[si - 1] = p_si
        total = total + p_si
        prev = cur
    qscale = float(_TOTAL) / jnp.maximum(total, 1e-30)

    # ---- quantize bookkeeping (both directions need amax/deficit) ----
    # (freq_s is recomputed identically in both passes below from the
    # same stored pmf and qscale — bit-exact by construction)
    zero = jnp.zeros((m, r_dim), jnp.int32)
    sumf, maxf, amax = zero, zero, zero
    for si in range(s_dim):
        f_s = jnp.maximum(jnp.floor(pmf_s[si] * qscale), 1.0).astype(
            jnp.int32)
        is_new = f_s > maxf
        amax = jnp.where(is_new, si, amax)
        maxf = jnp.maximum(maxf, f_s)
        sumf = sumf + f_s
    deficit = _TOTAL - sumf

    # ---- teacher-only: interval extraction for the external encoder ----
    @pl.when(teacher)
    def _teacher_pass():
        start_t, freq_t = zero, zero
        for si in range(s_dim):
            f_s = jnp.maximum(jnp.floor(pmf_s[si] * qscale),
                              1.0).astype(jnp.int32)
            start_t = start_t + jnp.where(si < sym_teach, f_s, 0)
            freq_t = jnp.where(si == sym_teach, f_s, freq_t)
        starts_ref[0] = start_t + jnp.where(amax < sym_teach, deficit, 0)
        freqs_ref[0] = freq_t + jnp.where(amax == sym_teach, deficit, 0)

    # ---- decode-only: per-group rANS transitions ----
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (mg, r_dim), 1)
    valid = (r_iota // b) < cnt                         # (Mg, R) lanes
    cap = words_ref.shape[0]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (cap, mg, r_dim), 0)

    @pl.when(jnp.logical_not(teacher))
    def _decode_pass():
        x = x_s[...]
        p = p_s[...]
        for gi in range(groups):
            sl = slice(gi * mg, (gi + 1) * mg)
            qs_g = qscale[sl]
            amax_g = amax[sl]
            def_g = deficit[sl]
            cf = (x & jnp.uint32(_U16)).astype(jnp.int32)   # (Mg, R)
            c_run = jnp.zeros((mg, r_dim), jnp.int32)
            sym = jnp.zeros((mg, r_dim), jnp.int32)
            start_i = jnp.zeros((mg, r_dim), jnp.int32)
            nxt = jnp.full((mg, r_dim), _TOTAL, jnp.int32)
            for si in range(s_dim):
                f_s = jnp.maximum(jnp.floor(pmf_s[si, sl] * qs_g),
                                  1.0).astype(jnp.int32)
                f_s = f_s + jnp.where(si == amax_g, def_g, 0)
                c_run = c_run + f_s
                le = c_run <= cf
                sym = sym + le.astype(jnp.int32)
                start_i = jnp.maximum(start_i,
                                      c_run * le.astype(jnp.int32))
                nxt = jnp.minimum(nxt,
                                  jnp.where(le, jnp.int32(_TOTAL), c_run))
            f_d = (nxt - start_i).astype(jnp.uint32)
            x_new = f_d * (x >> PROB_BITS) + cf.astype(jnp.uint32) \
                - start_i.astype(jnp.uint32)
            need = x_new < jnp.uint32(_RANS_L)
            p_read = jnp.maximum(p - 1, 0)
            word = jnp.sum(
                jnp.where(iota_c == p_read[None], words_ref[...], 0),
                axis=0).astype(jnp.uint32)
            x_new = jnp.where(need, (x_new << PROB_BITS) | word, x_new)
            x = jnp.where(valid, x_new, x)
            p = jnp.where(valid & need, p - 1, p)
            symdec_s[sl] = sym
        x_s[...] = x
        p_s[...] = p

    # ---- select, correct, emit ----
    sym_dec = symdec_s[...]                             # (M, R)
    sym_sel = jnp.where(teacher, sym_teach, sym_dec)
    resid = sym_sel - mm
    resid = jnp.where(teacher, resid_true,
                      jnp.where(cmask_ref[0] != 0, cval_ref[0], resid))
    y_hat_l = resid.astype(jnp.float32) + means         # (M, R)
    ylv_ref[0] = y_hat_l
    residlv_ref[0] = resid_true

    # ---- ring write (zero the slot, then the valid rows) ----
    slot_w = s % _RING
    y_rm = jnp.transpose(y_hat_l).reshape(p_max, b, m)  # (pmax, B, M)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (p_max, b, m), 0)
    upd = jnp.where(row_iota < cnt, y_rm, 0.0)
    ybuf[slot_w] = jnp.zeros((rows, b, m), ybuf.dtype)
    ybuf[slot_w, pl.ds(_RPAD + lo, p_max), :, :] = upd.astype(ybuf.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("hy", "wy", "mm", "groups", "wdtype", "interpret"))
def ar_wavefront_pallas(weights, pre, post, y_true, corr_mask, corr_val,
                        words, counts, states, teacher,
                        hy: int, wy: int, mm: int, groups: int,
                        wdtype=jnp.float32, interpret: bool = False):
    """Drop-in Pallas version of ar_device.ar_wavefront (same contract:
    returns starts/freqs (T_slots, L), y_hat (B,hy,wy,M) f32, resid int32;
    same lane mapping slot=level*G+g, lane=(b*Pmax+p)*Mg+mc).

    `wdtype` is the matmul operand dtype (bf16 on TPU halves the VMEM
    weight footprint; activations accumulate in f32 either way).
    """
    b = pre.shape[0]
    m = weights.ctx_kernel.shape[2]
    p_dim = pre.shape[-1]
    q_dim = post.shape[-1]
    n_levels, i_min_np, count_np, p_max = schedule(hy, wy)
    assert m % groups == 0
    mg = m // groups
    r_dim = b * p_max
    lanes = r_dim * mg
    s_dim = 2 * mm + 1
    rows = hy + p_max + 2 * _RPAD
    cap = words.shape[1]

    # ---- static gather maps (schedule is compile-time) ----
    i_of = np.zeros((n_levels, p_max), np.int32)
    j_of = np.zeros((n_levels, p_max), np.int32)
    valid_np = np.zeros((n_levels, p_max), bool)
    for s in range(n_levels):
        for p in range(int(count_np[s])):
            i = int(i_min_np[s]) + p
            j = s - 3 * i
            i_of[s, p] = i
            j_of[s, p] = j
            valid_np[s, p] = True
    flat_lv = jnp.asarray(i_of * wy + j_of).reshape(-1)     # (L*pmax,)
    vmask = jnp.asarray(valid_np)

    def to_level_rows(t):
        """(B, hy, wy, C) -> (n_levels, R, C), R in the kernel's
        (p, b) lane order."""
        c = t.shape[-1]
        flat = t.reshape(b, hy * wy, c)
        lv = jnp.take(flat, flat_lv, axis=1)
        lv = lv.reshape(b, n_levels, p_max, c)
        lv = jnp.where(vmask[None, :, :, None], lv, 0)
        return lv.transpose(1, 2, 0, 3).reshape(n_levels, r_dim, c)

    def to_level_cm(t):
        """(B, hy, wy, C) -> (n_levels, C, R) channel-major levels."""
        c = t.shape[-1]
        lv = to_level_rows(t)                                # (L, R, C)
        return lv.transpose(0, 2, 1)

    pre_lv = to_level_rows(pre.astype(jnp.float32))
    post_lv = to_level_rows(post.astype(jnp.float32)) if q_dim else None
    y_lv = to_level_cm(y_true.astype(jnp.float32))
    cm_lv = to_level_cm(corr_mask.astype(jnp.int32))
    cv_lv = to_level_cm(corr_val.astype(jnp.int32))

    # streams: container lane l = (b*p_max + p)*Mg + mc -> kernel
    # (Mg, R) with R in (p, b) order
    words_k = words.astype(jnp.int32).reshape(b, p_max, mg, cap) \
        .transpose(3, 2, 1, 0).reshape(cap, mg, r_dim)
    counts_k = counts.astype(jnp.int32).reshape(b, p_max, mg) \
        .transpose(2, 1, 0).reshape(mg, r_dim)
    states_k = states.astype(jnp.uint32).reshape(b, p_max, mg) \
        .transpose(2, 1, 0).reshape(mg, r_dim)

    # weights (tap kernels concatenated in _TAPS order)
    tapk = jnp.concatenate(
        [jnp.asarray(weights.ctx_kernel[2 + di, 2 + dj])
         for (di, dj) in _TAPS], axis=0).astype(wdtype)       # (12M, 2M)
    ctxb = jnp.asarray(weights.ctx_bias,
                       jnp.float32).reshape(1, -1)
    ep_w = [jnp.asarray(k).astype(wdtype) for k in weights.ep_kernels]
    ep_b = [jnp.asarray(v, jnp.float32).reshape(1, -1)
            for v in weights.ep_biases]

    teach = jnp.asarray(teacher, jnp.int32).reshape(1, 1)

    const = lambda *shape: (lambda s_, *rest: tuple(  # noqa: E731
        0 for _ in shape))
    lv_map = lambda s_: (s_, 0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((1, 1), lambda s_: (0, 0),
                     memory_space=pltpu.SMEM),                 # teacher
        pl.BlockSpec((1, r_dim, p_dim), lv_map,
                     memory_space=pltpu.VMEM),                 # pre
    ]
    inputs = [teach, pre_lv]
    if q_dim:
        in_specs.append(pl.BlockSpec((1, r_dim, q_dim), lv_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(post_lv)
    for t in (y_lv, cm_lv, cv_lv):
        in_specs.append(pl.BlockSpec((1, m, r_dim), lv_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(t)
    big_weights = {id(tapk), id(ep_w[0]), id(ep_w[1]), id(ep_w[2])}
    for t in (words_k, counts_k, states_k, tapk, ctxb,
              ep_w[0], ep_b[0], ep_w[1], ep_b[1], ep_w[2], ep_b[2]):
        if id(t) in big_weights:
            # stays in HBM; DMA'd once into scratch at level 0
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        else:
            in_specs.append(pl.BlockSpec(
                t.shape, const(*t.shape), memory_space=pltpu.VMEM))
        inputs.append(t)

    out_specs = [
        pl.BlockSpec((1, m, r_dim), lv_map, memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_levels, m, r_dim), jnp.int32),   # starts
        jax.ShapeDtypeStruct((n_levels, m, r_dim), jnp.int32),   # freqs
        jax.ShapeDtypeStruct((n_levels, m, r_dim), jnp.float32),  # y_hat
        jax.ShapeDtypeStruct((n_levels, m, r_dim), jnp.int32),   # resid
    ]

    kernel = functools.partial(
        _kernel if q_dim else _kernel_nopost,
        b=b, p_max=p_max, m=m, mg=mg, groups=groups, mm=mm,
        hy=hy, wy=wy, rows=rows, wdtype=wdtype)

    starts_lv, freqs_lv, ylv, residlv = pl.pallas_call(
        kernel,
        grid=(n_levels,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((_RING, rows, b, m), wdtype),
            pltpu.VMEM((s_dim, m, r_dim), jnp.float32),
            pltpu.VMEM((mg, r_dim), jnp.uint32),
            pltpu.VMEM((mg, r_dim), jnp.int32),
            pltpu.VMEM((m, r_dim), jnp.int32),
            pltpu.VMEM(tapk.shape, tapk.dtype),
            pltpu.VMEM(ep_w[0].shape, ep_w[0].dtype),
            pltpu.VMEM(ep_w[1].shape, ep_w[1].dtype),
            pltpu.VMEM(ep_w[2].shape, ep_w[2].dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(*inputs)

    # (L, M, R_pb) -> (T_slots, lanes): slot = l*G + g,
    # external lane = (b*p_max + p)*Mg + mc, channel m = g*Mg + mc
    def to_slots(t):
        t = t.reshape(n_levels, groups, mg, p_max, b)
        return t.transpose(0, 1, 4, 3, 2).reshape(n_levels * groups, lanes)

    starts = to_slots(starts_lv)
    freqs = to_slots(freqs_lv)

    # (L, M, R) -> (B, hy, wy, M)
    s_img = np.zeros((hy, wy), np.int32)
    p_img = np.zeros((hy, wy), np.int32)
    for i in range(hy):
        for j in range(wy):
            s = 3 * i + j
            s_img[i, j] = s
            p_img[i, j] = i - int(i_min_np[s])
    flat_img = jnp.asarray(s_img * p_max + p_img).reshape(-1)

    def from_levels(t):
        u = t.reshape(n_levels, m, p_max, b).transpose(3, 1, 0, 2)
        u = u.reshape(b, m, n_levels * p_max)
        u = jnp.take(u, flat_img, axis=2).reshape(b, m, hy, wy)
        return u.transpose(0, 2, 3, 1)

    return starts, freqs, from_levels(ylv), from_levels(residlv)


def _kernel_nopost(teacher_ref, pre_ref, ytrue_ref, cmask_ref, cval_ref,
                   words_ref, counts_ref, states_ref,
                   tapk_ref, ctxb_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref,
                   starts_ref, freqs_ref, ylv_ref, residlv_ref,
                   ybuf, pmf_s, x_s, p_s, symdec_s,
                   tapk_v, w0_v, w1_v, w2_v, wsem, **kw):
    _kernel(teacher_ref, pre_ref, None, ytrue_ref, cmask_ref, cval_ref,
            words_ref, counts_ref, states_ref,
            tapk_ref, ctxb_ref, w0_ref, b0_ref, w1_ref, b1_ref,
            w2_ref, b2_ref,
            starts_ref, freqs_ref, ylv_ref, residlv_ref,
            ybuf, pmf_s, x_s, p_s, symdec_s,
            tapk_v, w0_v, w1_v, w2_v, wsem, **kw)
