"""Raster-causal (PixelCNN-context) codec paths, restructured for TPU.

The reference implements both directions as per-pixel Python loops crossing
the Python/C++ boundary at every pixel (models/priors.py:516-541 encode,
:577-607 decode — the acknowledged hot spot ":519 Warning, this is slow";
doubled in the HESIC+ codec, ywz/mywork/newnet1_joint.py:793-1322).

Here:
  * ENCODE is one on-device ``lax.scan`` over raster positions: each step is
    a handful of small matmuls (context taps + entropy-parameter MLP); the
    whole latent's symbols/indexes come back to the host in one transfer and
    are entropy-coded in one native call.
  * DECODE is inherently serial through the bitstream, so it runs on the
    host — but the per-row "upper" context (taps from already-decoded rows)
    is one (W, 10*M) x (10*M, 2*M) matmul per row; only the two
    left-neighbor taps + the 1x1 MLP run per pixel.  All weights cross the
    boundary once.

The entropy-parameter MLP input is ``concat([pre, ctx, post])`` where `pre`
is the hyper-synthesis output and `post` an optional extra conditioning map
(HESIC+ feeds the re-encoded decoded-left latent there,
newnet1_joint.py:659-665).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy_models import build_indexes
from ..layers import raster_causal_mask
from .. import codecs

_PAD = 2  # context kernel is 5x5


class ArWeights(NamedTuple):
    """Context + entropy-parameter weights, pulled from the param tree."""

    ctx_kernel: jnp.ndarray  # (5, 5, M, 2M), causality mask already applied
    ctx_bias: jnp.ndarray    # (2M,)
    ep_kernels: tuple        # three (Cin, Cout) 1x1 kernels
    ep_biases: tuple


def _ep_layer_names(params, prefix: str) -> list[str]:
    names = [k for k in params if k.startswith(prefix + "_")]
    return sorted(names, key=lambda s: int(s.rsplit("_", 1)[1]))


def extract_ar_weights(params, ctx_name: str = "context_prediction",
                       ep_prefix: str = "entropy_parameters") -> ArWeights:
    """Pull the autoregressive weights out of a model's param tree."""
    ctx = params[ctx_name]
    k = jnp.asarray(ctx["kernel"])
    mask = raster_causal_mask(k.shape[0], k.shape[1], "A")
    names = _ep_layer_names(params, ep_prefix)
    if len(names) != 3:
        raise ValueError(f"expected 3 {ep_prefix} convs, got {names}")
    eps = [params[n] for n in names]
    return ArWeights(
        ctx_kernel=k * mask[:, :, None, None],
        ctx_bias=jnp.asarray(ctx["bias"]),
        ep_kernels=tuple(jnp.asarray(p["kernel"])[0, 0] for p in eps),
        ep_biases=tuple(jnp.asarray(p["bias"]) for p in eps),
    )


def _ep_mlp(feat, w: ArWeights):
    """entropy_parameters: 1x1 conv stack = per-pixel MLP with leaky ReLUs."""
    g = feat @ w.ep_kernels[0] + w.ep_biases[0]
    g = jax.nn.leaky_relu(g)
    g = g @ w.ep_kernels[1] + w.ep_biases[1]
    g = jax.nn.leaky_relu(g)
    g = g @ w.ep_kernels[2] + w.ep_biases[2]
    return g


@jax.jit
def ar_encode_scan(w: ArWeights, y, pre, post, scale_table):
    """Run the raster recursion on device; emit symbols + indexes.

    y: (B, H, W, M); pre: (B, H, W, P); post: (B, H, W, Q) (Q may be 0);
    scale_table: (L,).  Returns (symbols, indexes, y_hat), all (B, H, W, M).
    """
    b, h, w_dim, m = y.shape
    y_hat_pad = jnp.zeros((b, h + 2 * _PAD, w_dim + 2 * _PAD, m), jnp.float32)

    def step(carry, pos):
        buf = carry
        hh = pos // w_dim
        ww = pos % w_dim
        crop = jax.lax.dynamic_slice(
            buf, (0, hh, ww, 0), (b, 2 * _PAD + 1, 2 * _PAD + 1, m))
        ctx = jnp.einsum("bijc,ijco->bo", crop, w.ctx_kernel) + w.ctx_bias
        p = jax.lax.dynamic_slice(
            pre, (0, hh, ww, 0), (b, 1, 1, pre.shape[-1]))[:, 0, 0]
        q = jax.lax.dynamic_slice(
            post, (0, hh, ww, 0), (b, 1, 1, post.shape[-1]))[:, 0, 0]
        g = _ep_mlp(jnp.concatenate([p, ctx, q], axis=-1), w)
        scales, means = jnp.split(g, 2, axis=-1)
        yv = jax.lax.dynamic_slice(y, (0, hh, ww, 0), (b, 1, 1, m))[:, 0, 0]
        y_q = jnp.round(yv - means)
        buf = jax.lax.dynamic_update_slice(
            buf, (y_q + means)[:, None, None, :], (0, hh + _PAD, ww + _PAD, 0))
        idx = build_indexes(scales, scale_table)
        return buf, (y_q.astype(jnp.int32), idx)

    positions = jnp.arange(h * w_dim)
    buf, (symbols, indexes) = jax.lax.scan(step, y_hat_pad, positions)
    # scan stacks along axis 0: (H*W, B, M) -> (B, H, W, M)
    symbols = symbols.transpose(1, 0, 2).reshape(b, h, w_dim, m)
    indexes = indexes.transpose(1, 0, 2).reshape(b, h, w_dim, m)
    y_hat = buf[:, _PAD:-_PAD, _PAD:-_PAD, :]
    return symbols, indexes, y_hat


def _empty_post(pre):
    b, h, w_dim, _ = pre.shape
    return jnp.zeros((b, h, w_dim, 0), jnp.float32)


def _batch_parallel(fn, n: int):
    """Map fn over range(n), threading when n > 1 (the native coder
    releases the GIL, so threads scale across host cores)."""
    if n <= 1:
        return [fn(i) for i in range(n)]
    from concurrent.futures import ThreadPoolExecutor
    import os as _os
    workers = min(n, _os.cpu_count() or 4)
    with ThreadPoolExecutor(workers) as ex:
        return list(ex.map(fn, range(n)))


def _native_weights(codec, ctx_name: str, ep_prefix: str):
    from ..codecs.rans import ArWeightsNative
    w = extract_ar_weights(codec.params, ctx_name, ep_prefix)
    return ArWeightsNative(
        np.asarray(w.ctx_kernel), np.asarray(w.ctx_bias),
        [np.asarray(k) for k in w.ep_kernels],
        [np.asarray(b) for b in w.ep_biases], codec.scale_table)


def ar_compress(codec, y, pre, post=None,
                ctx_name: str = "context_prediction",
                ep_prefix: str = "entropy_parameters",
                gc_name: str = "gaussian_conditional"):
    """Autoregressive encode in the native runtime.

    Encoder and decoder share ONE C++ float implementation: the recursion's
    Gaussian parameters feed the coder, so computing them on different
    backends (e.g. encode on TPU, decode on host) risks f32 drift that
    corrupts the stream.  Returns (strings, y_hat (B, H, W, M)) — callers
    that condition later stages on the decoded-left latent must use this
    y_hat, not a device-side recomputation.
    """
    from ..codecs.rans import ar_code
    weights = _native_weights(codec, ctx_name, ep_prefix)
    pre = np.asarray(pre, np.float32)
    post_np = None if post is None else np.asarray(post, np.float32)
    tables = codec.tables[gc_name]
    y = np.asarray(y, np.float32)
    # images are independent streams and the native call releases the GIL,
    # so a thread pool gives true batch parallelism on the host cores
    outs = _batch_parallel(
        lambda i: ar_code(0, weights, pre[i],
                          None if post_np is None else post_np[i],
                          tables, y=y[i]),
        y.shape[0])
    strings = [o[0] for o in outs]
    return strings, jnp.asarray(np.stack([o[1] for o in outs]))


def ar_decompress(codec, y_strings: list[bytes], pre, post=None,
                  ctx_name: str = "context_prediction",
                  ep_prefix: str = "entropy_parameters",
                  gc_name: str = "gaussian_conditional") -> jnp.ndarray:
    """Autoregressive decode in the native runtime (pairs with
    ar_compress — identical float math)."""
    from ..codecs.rans import ar_code
    weights = _native_weights(codec, ctx_name, ep_prefix)
    pre = np.asarray(pre, np.float32)
    post_np = None if post is None else np.asarray(post, np.float32)
    tables = codec.tables[gc_name]
    outs = _batch_parallel(
        lambda i: ar_code(1, weights, pre[i],
                          None if post_np is None else post_np[i],
                          tables, stream=y_strings[i]),
        len(y_strings))
    return jnp.asarray(np.stack(outs))


def ar_decompress_reference(codec, y_strings: list[bytes], pre, post=None,
                            m=None,
                            ctx_name: str = "context_prediction",
                            ep_prefix: str = "entropy_parameters",
                            gc_name: str = "gaussian_conditional"
                            ) -> jnp.ndarray:
    """Row-pipelined numpy decoder (kept as an independent cross-check of
    the native implementation).

    pre: (B, H, W, P) hyper-synthesis output; post: optional (B, H, W, Q).
    Returns y_hat (B, H, W, M) float32.
    """
    w = extract_ar_weights(codec.params, ctx_name, ep_prefix)
    ctx_k = np.asarray(w.ctx_kernel)            # (5, 5, M, 2M)
    ctx_b = np.asarray(w.ctx_bias)
    ep_ks = [np.asarray(k) for k in w.ep_kernels]
    ep_bs = [np.asarray(bv) for bv in w.ep_biases]
    table = np.asarray(codec.scale_table, np.float32)
    thresholds = table[:-1]
    tables = codec.tables[gc_name]
    cdf = tables.quantized_cdf
    cdf_len = tables.cdf_length
    offsets = tables.offset

    pre = np.asarray(pre, np.float32)
    b, h, w_dim, _ = pre.shape
    m = ctx_k.shape[2] if m is None else m
    if post is None:
        post = np.zeros((b, h, w_dim, 0), np.float32)
    else:
        post = np.asarray(post, np.float32)

    # upper rows of the context kernel (decoded rows), flattened for matmul
    k_up = ctx_k[:_PAD].reshape(_PAD * 5 * m, 2 * m)       # (10M, 2M)
    k_left2 = ctx_k[_PAD, 0]                                # (M, 2M)
    k_left1 = ctx_k[_PAD, 1]                                # (M, 2M)

    def leaky(v):
        return np.where(v >= 0, v, 0.01 * v)

    y_hat = np.zeros((b, h + 2 * _PAD, w_dim + 2 * _PAD, m), np.float32)
    dec = codecs.RansDecoder()
    for i in range(b):
        dec.set_stream(y_strings[i])
        for hh in range(h):
            rows = y_hat[i, hh:hh + _PAD]                   # (2, W+4, M)
            windows = np.lib.stride_tricks.sliding_window_view(
                rows, 5, axis=1)                            # (2, W, M, 5)
            x_up = windows.transpose(1, 0, 3, 2).reshape(
                w_dim, _PAD * 5 * m)
            ctx_up = x_up @ k_up                            # (W, 2M)
            p_row = pre[i, hh]                              # (W, P)
            q_row = post[i, hh]                             # (W, Q)
            row_buf = y_hat[i, hh + _PAD]                   # (W+4, M) view
            for ww in range(w_dim):
                ctx = (ctx_up[ww] + row_buf[ww] @ k_left2
                       + row_buf[ww + 1] @ k_left1 + ctx_b)
                feat = np.concatenate([p_row[ww], ctx, q_row[ww]])
                g = leaky(feat @ ep_ks[0] + ep_bs[0])
                g = leaky(g @ ep_ks[1] + ep_bs[1])
                g = g @ ep_ks[2] + ep_bs[2]
                scales = np.maximum(g[:m], table[0])
                means = g[m:]
                idx = (scales[:, None] > thresholds).sum(axis=1)
                rv = dec.decode_stream(idx.astype(np.int32), cdf, cdf_len,
                                       offsets)
                row_buf[ww + _PAD] = rv.astype(np.float32) + means
    return jnp.asarray(y_hat[:, _PAD:-_PAD, _PAD:-_PAD, :])
