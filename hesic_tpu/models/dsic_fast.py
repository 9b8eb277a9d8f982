"""DSIC fast codec: the on-device fused codec architecture for DSIC.

Reuses the whole HESICFastCodec machinery (interleaved-lane device rANS
with Pallas kernels, fused GMM->PMF pipeline with per-channel grid
centering, escape corrections, packed single-transfer containers) and
swaps only the model-specific programs.  DSIC's cross-eye entropy model
is in fact SIMPLER than HESIC's: the right-eye GMM conditions directly
on the un-warped decoded left latent (reference mynet6.py:662), so
cond2 is a pure hyper-synthesis program — no synthesis/warp/re-encode
chain.

BIT-EXACTNESS: as in hesic_fast, the conditioning programs (cond1 =
gmm1 chain, cond2 = gmm2 chain) are shared jitted executables run by
both compress and decompress.  The cost-volume transforms (analysis2 /
synthesis2) feed only reconstructions, never the coder, so their
placement is unconstrained.

The homography argument of the shared container flow is ignored (DSIC
is homography-free); ``compress_fast`` defaults it to identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dsic_codec import DSICCodec
from .hesic_fast import (LANES_DEFAULT, MM_DEFAULT, HESICFastCodec,
                         _data_center, _gmm_freq_fast)


class DSICFastCodec(DSICCodec, HESICFastCodec):
    """DSIC with the fused on-device codec as the primary path.

    ``compress``/``decompress`` keep DSICCodec's reference-layout
    container; ``compress_fast``/``decompress_fast[_batch]`` use the
    on-device coder (batched)."""

    def __init__(self, module, params, mm: int = MM_DEFAULT,
                 lanes: int = LANES_DEFAULT, codec_batch: int = 8):
        HESICFastCodec.__init__(self, module, params, mm=mm, lanes=lanes,
                                codec_batch=codec_batch)

    def _fn(self, name: str, win: int = 64, xwin=None):
        # DSIC has no homography warp; `win`/`xwin` are accepted for
        # interface compatibility and ignored
        if name in self._fns:
            return self._fns[name]
        module, mm = self.module, self.mm

        def apply(params, method, *args):
            return module.apply({"params": params}, *args, method=method)

        if name == "transforms_enc":
            # images -> true integer latents + z symbols (encoder only).
            # The taps/contexts feeding analysis2 come from the TRUE left
            # image and the quantized left latent, exactly like the
            # reference codec flow (mynet6_plus.py compress).
            @jax.jit
            def fn(params, x1, x2, h):
                y1, g1_1, g1_2, g1_3 = apply(params, "analysis1", x1)
                z1 = apply(params, "hyper_analysis1", y1)
                med1 = params["entropy_bottleneck1"]["quantiles"][:, 0, 1]
                z1_sym = jnp.round(z1 - med1).astype(jnp.int32)
                y1_hat = jnp.round(y1).astype(jnp.int32)
                y1f = y1_hat.astype(jnp.float32)
                contexts = apply(params, "contexts", y1f)
                y2 = apply(params, "analysis2", x2, g1_1, g1_2, g1_3,
                           contexts)
                z2 = apply(params, "hyper_analysis2", y2)
                med2 = params["entropy_bottleneck2"]["quantiles"][:, 0, 1]
                z2_sym = jnp.round(z2 - med2).astype(jnp.int32)
                y2_hat = jnp.round(y2).astype(jnp.int32)
                wov = jnp.zeros((x1.shape[0],), jnp.int32)
                dc1, sp1 = _data_center(y1_hat)
                dc2, sp2 = _data_center(y2_hat)
                return (y1_hat, y2_hat, z1_sym, z2_sym, wov,
                        dc1, dc2, sp1, sp2)

        elif name == "synth_out":
            # reconstructions: left decoder taps + global contexts feed
            # the cost-volume right decoder (mynet6.py synthesis chain)
            @jax.jit
            def fn(params, aux, y2_hat, h):
                y1f = aux
                x1_hat, g1_4, g1_5, g1_6 = apply(params, "synthesis1", y1f)
                contexts = apply(params, "contexts", y1f)
                x2_hat = apply(params, "synthesis2",
                               y2_hat.astype(jnp.float32),
                               g1_4, g1_5, g1_6, contexts)
                return x1_hat, x2_hat

        else:
            # cond1 / streams / packing are model-agnostic
            return HESICFastCodec._fn(self, name, win, xwin)
        self._fns[name] = fn
        return fn

    def _cond_fns(self, mm: int, win: int = 64, xwin=None):
        """DSIC's cond2 is simpler than HESIC's: gmm2 conditions on the
        un-warped decoded left latent (mynet6.py:662); aux = the float
        left latent for synth_out."""
        key = ("cond", mm)
        if key not in self._fns:
            module = self.module

            def apply(params, method, *args):
                return module.apply({"params": params}, *args,
                                    method=method)

            @jax.jit
            def cond1(params, z1_sym, center):
                med1 = params["entropy_bottleneck1"]["quantiles"][:, 0, 1]
                z1_hat = z1_sym.astype(jnp.float32) + med1
                gmm1 = apply(params, "gmm1", z1_hat)
                freq1, _ = _gmm_freq_fast(gmm1[0], gmm1[1], gmm1[2], mm,
                                          module.K, center=center)
                return freq1

            @jax.jit
            def cond2(params, y1_hat, z2_sym, h, center):
                y1f = y1_hat.astype(jnp.float32)
                med2 = params["entropy_bottleneck2"]["quantiles"][:, 0, 1]
                z2_hat = z2_sym.astype(jnp.float32) + med2
                gmm2 = apply(params, "gmm2", z2_hat, y1f)
                freq2, _ = _gmm_freq_fast(gmm2[0], gmm2[1], gmm2[2], mm,
                                          module.K, center=center)
                return freq2, y1f

            self._fns[key] = (cond1, cond2)
        return self._fns[key]

    def _synth_aux_sd(self, b: int, h_img: int, w_img: int):
        """DSIC's synth_out aux is the float left latent (not an image)."""
        return jax.ShapeDtypeStruct(
            (b, h_img // 16, w_img // 16, self.module.M), jnp.float32)

    def compress_fast(self, x1, x2, h_matrix=None,
                      batch_container: bool = False):
        if h_matrix is None:
            h_matrix = jnp.eye(3, dtype=jnp.float32)[None]
        return HESICFastCodec.compress_fast(self, x1, x2, h_matrix,
                                            batch_container)
