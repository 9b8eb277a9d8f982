"""Batch-parallel codec over a device mesh (SURVEY §7 step 9).

The reference has no multi-device story at all (SURVEY §2.4); here the
HESIC fast codec's device programs run SPMD with every batch-led tensor
sharded over the mesh's ``data`` axis — encode on N chips, decode on N
chips, one container.  The check below asserts the two properties that
make this production-usable:

  * bit-exact roundtrip under sharding: the decoder reproduces the
    encoder's quantized latents (encode and decode place inputs with the
    SAME NamedSharding, so the shared conditioning programs hit one
    compiled SPMD executable — the hesic_fast bit-exactness invariant);
  * equivalence with the single-device codec: container bytes and
    decoded latents match the unsharded run (per-example transforms
    reduce only within an example, so batch partitioning does not
    perturb the f32 conditioning chain).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .mesh import Mesh, batch_sharding


def sharded_codec_roundtrip(mesh: Mesh, size: int = 64,
                            batch_per_device: int = 1,
                            seed: int = 0, arch: str = "hesic") -> dict:
    """Run one fast-codec encode+decode (`arch`: 'hesic', 'dsic' or
    'hesic-plus' — the last exercising the WAVEFRONT device codec) with
    the batch sharded over the mesh's data axis; assert bit-exactness
    and equality with the single-device run.  Returns summary stats."""
    from ..models import DSIC, DSICFastCodec, HESIC, HESICFastCodec

    if arch == "hesic-plus":
        return _sharded_wavefront_roundtrip(mesh, size, batch_per_device,
                                            seed)

    dp = mesh.shape["data"]
    b = dp * batch_per_device
    rng = np.random.RandomState(seed)
    x1 = jnp.asarray(rng.rand(b, size, size, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(b, size, size, 3), jnp.float32)
    h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))

    if arch == "dsic":
        module = DSIC(N=8, M=16, F=6, C=8, K=2)
        codec = DSICFastCodec.init(
            module, [(1, size, size, 3), (1, size, size, 3)])
        codec = DSICFastCodec(codec.module, codec.params, mm=8,
                              codec_batch=b)
    else:
        module = HESIC(N=8, M=16, K=2)
        codec = HESICFastCodec.init(
            module, [(1, size, size, 3), (1, size, size, 3), (1, 3, 3)])
        codec = HESICFastCodec(codec.module, codec.params, mm=8,
                               codec_batch=b)
    codec.update()

    # single-device baseline
    out0 = codec.compress_fast(x1, x2, h, batch_container=True)
    rec0 = codec.decompress_fast_batch(out0["blob"])

    # sharded run through the same codec object
    codec.placement = batch_sharding(mesh)
    try:
        out1 = codec.compress_fast(x1, x2, h, batch_container=True)
        rec1 = codec.decompress_fast_batch(out1["blob"])
    finally:
        codec.placement = None

    # bit-exact roundtrip under sharding: decoded latents == encoder's
    y1h, y2h = codec._fn("transforms_enc")(codec.params, x1, x2, h)[:2]
    np.testing.assert_array_equal(np.asarray(rec1["y1_hat"]),
                                  np.asarray(y1h).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(rec1["y2_hat"]),
                                  np.asarray(y2h).astype(np.float32))

    # equivalence with the single-device codec
    assert out1["blob"] == out0["blob"], (
        "sharded encode produced different container bytes "
        f"({len(out1['blob'])} vs {len(out0['blob'])})")
    np.testing.assert_array_equal(np.asarray(rec1["y1_hat"]),
                                  np.asarray(rec0["y1_hat"]))
    np.testing.assert_array_equal(np.asarray(rec1["y2_hat"]),
                                  np.asarray(rec0["y2_hat"]))

    return {
        "pairs": b,
        "blob_bytes": len(out1["blob"]),
        "bpp_real": out1["bpp_real"],
    }


def _sharded_wavefront_roundtrip(mesh: Mesh, size: int,
                                 batch_per_device: int,
                                 seed: int) -> dict:
    """Wavefront (HESIC+) device codec under a mesh sharding.

    The wavefront programs fold the batch axis into rANS lanes inside
    the level scan, so GSPMD cannot keep the batch partitioned end to
    end — it partitions the conv transforms over ``data`` and inserts
    the gather collectives where the lane fold crosses the sharded
    axis.  That is exactly what this dryrun must prove: the full
    device-codec chain (enc transforms → both-eye wavefront → output
    synthesis) compiles and executes SPMD, and the container bytes and
    decoded latents are bit-identical to the single-device run (per-
    example conv math is unchanged by batch partitioning; the coding
    recursion is integer).  Off-TPU the wavefront runs its lax.scan
    backend — the same op sequence the CPU CI tests pin.
    """
    import jax

    from ..models import HESICPlus, HESICPlusCodec, HESICPlusDeviceCodec

    dp = mesh.shape["data"]
    b = dp * batch_per_device
    rng = np.random.RandomState(seed)
    x1 = jnp.asarray(rng.rand(b, size, size, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(b, size, size, 3), jnp.float32)
    h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))

    module = HESICPlus(N=8, M=16)
    base = HESICPlusCodec.init(
        module, [(1, size, size, 3), (1, size, size, 3), (1, 3, 3)])
    base.update()
    codec = HESICPlusDeviceCodec(base, mm=8, groups=4)

    # single-device baseline
    out0 = codec.compress(x1, x2, h)
    rec0 = codec.decompress(out0["strings"])

    # sharded run: committed batch placements; jit propagates them
    # through the fused programs (params stay replicated)
    shard = batch_sharding(mesh)
    out1 = codec.compress(jax.device_put(x1, shard),
                          jax.device_put(x2, shard),
                          jax.device_put(h, shard))
    rec1 = codec.decompress(out1["strings"])

    assert out1["strings"][0] == out0["strings"][0], (
        "sharded wavefront encode produced different container bytes "
        f"({len(out1['strings'][0])} vs {len(out0['strings'][0])})")
    for key in ("y1_hat", "y2_hat"):
        np.testing.assert_array_equal(np.asarray(rec1[key]),
                                      np.asarray(out1[key]))
        np.testing.assert_array_equal(np.asarray(rec1[key]),
                                      np.asarray(rec0[key]))

    return {
        "pairs": b,
        "blob_bytes": len(out1["strings"][0]),
        "bpp_real": out1["bpp_real"],
    }
