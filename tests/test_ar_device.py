"""Wavefront device AR codec: schedule validity + exact roundtrips."""

import jax.numpy as jnp
import numpy as np
import pytest

from hesic_tpu.models import (JointAutoregressiveCodec,
                              JointAutoregressiveHierarchicalPriors)
from hesic_tpu.models.ar_device import (JointAutoregressiveDeviceCodec,
                                        _TAPS, schedule)


class TestSchedule:
    def test_taps_strictly_earlier(self):
        # every mask-A tap must land at a smaller wavefront level
        assert all(3 * di + dj < 0 for (di, dj) in _TAPS)
        assert len(_TAPS) == 12

    @pytest.mark.parametrize("hy,wy", [(4, 4), (5, 9), (8, 3), (1, 7)])
    def test_levels_partition_pixels(self, hy, wy):
        n_levels, i_min, count, p_max = schedule(hy, wy)
        seen = np.zeros((hy, wy), bool)
        for s in range(n_levels):
            for p in range(count[s]):
                i = int(i_min[s]) + p
                j = s - 3 * i
                assert 0 <= i < hy and 0 <= j < wy
                assert not seen[i, j]
                seen[i, j] = True
        assert seen.all()
        assert p_max == count.max()


def _codec(seed=0, n=16, m=16, mm=8, groups=4):
    module = JointAutoregressiveHierarchicalPriors(N=n, M=m)
    base = JointAutoregressiveCodec.init(module, [(1, 64, 64, 3)],
                                         seed=seed)
    base.update()
    return JointAutoregressiveDeviceCodec(base, mm=mm, groups=groups)


class TestWavefrontRoundtrip:
    def test_roundtrip_exact(self):
        codec = _codec()
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        out = codec.compress(x)
        rec = codec.decompress(out["strings"])
        np.testing.assert_array_equal(np.asarray(rec["y_hat"]),
                                      np.asarray(out["y_hat"]))
        assert 0 < out["bpp_real"] < 64
        assert rec["x_hat"].shape == x.shape

    def test_escape_corrections_roundtrip(self):
        # a tiny grid forces out-of-grid residuals through the exact
        # side-channel, which must feed the recursion mid-scan
        codec = _codec(mm=1)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 64, 64, 3) * 4 - 1.5, jnp.float32)
        out = codec.compress(x)
        blob = out["strings"][0]
        # 1 B backend tag + 5 x u32 header -> escape count at offset 21
        # (the pre-r3 version of this check read mid-header and was
        # trivially true)
        (n_esc,) = np.frombuffer(blob, np.uint32, 1, 21)
        assert n_esc > 0, "test setup: no escapes triggered"
        rec = codec.decompress(out["strings"])
        np.testing.assert_array_equal(np.asarray(rec["y_hat"]),
                                      np.asarray(out["y_hat"]))

    def test_groups_change_stream_not_result(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
        outs = []
        for groups in (1, 4):
            codec = _codec(seed=3, groups=groups)
            out = codec.compress(x)
            rec = codec.decompress(out["strings"])
            np.testing.assert_array_equal(np.asarray(rec["y_hat"]),
                                          np.asarray(out["y_hat"]))
            outs.append(np.asarray(out["y_hat"]))
        np.testing.assert_array_equal(outs[0], outs[1])


class TestHESICPlusDevice:
    def test_roundtrip_exact(self):
        from hesic_tpu.models import (HESICPlus, HESICPlusCodec,
                                      HESICPlusDeviceCodec)
        rng = np.random.RandomState(5)
        x1 = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        x2 = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (2, 1, 1))
        module = HESICPlus(N=16, M=24)
        base = HESICPlusCodec.init(module, [x1.shape, x2.shape, h.shape])
        base.update()
        codec = HESICPlusDeviceCodec(base, mm=8, groups=4)
        out = codec.compress(x1, x2, h)
        rec = codec.decompress(out["strings"])
        np.testing.assert_array_equal(np.asarray(rec["y1_hat"]),
                                      np.asarray(out["y1_hat"]))
        np.testing.assert_array_equal(np.asarray(rec["y2_hat"]),
                                      np.asarray(out["y2_hat"]))
        assert rec["x2_hat"].shape == x2.shape
        assert 0 < out["bpp_real"] < 64

    def test_escape_corrections_roundtrip(self):
        # mm=1 forces out-of-grid residuals on BOTH eyes through the
        # exact side-channels of the fused chain (which must feed each
        # wavefront recursion mid-scan, and eye-2's left prior depends
        # on eye-1 decoding with its corrections applied)
        from hesic_tpu.models import (HESICPlus, HESICPlusCodec,
                                      HESICPlusDeviceCodec)
        rng = np.random.RandomState(11)
        x1 = jnp.asarray(rng.rand(1, 64, 64, 3) * 4 - 1.5, jnp.float32)
        x2 = jnp.asarray(rng.rand(1, 64, 64, 3) * 4 - 1.5, jnp.float32)
        h = jnp.eye(3, dtype=jnp.float32)[None]
        module = HESICPlus(N=16, M=24)
        base = HESICPlusCodec.init(module, [x1.shape, x2.shape, h.shape],
                                   seed=13)
        base.update()
        codec = HESICPlusDeviceCodec(base, mm=1, groups=4)
        out = codec.compress(x1, x2, h)
        blob = out["strings"][0]
        # escapes of eye 1 start right after the 1 B tag + 5 u32 header
        (n_esc1,) = np.frombuffer(blob, np.uint32, 1, 21)
        assert n_esc1 > 0, "test setup: no eye-1 escapes triggered"
        rec = codec.decompress(out["strings"])
        np.testing.assert_array_equal(np.asarray(rec["y1_hat"]),
                                      np.asarray(out["y1_hat"]))
        np.testing.assert_array_equal(np.asarray(rec["y2_hat"]),
                                      np.asarray(out["y2_hat"]))

    def test_device_flops_counts_every_program(self):
        """MFU accounting (bench.py BENCH_MODE=hesic-plus-device): each
        of the three fused programs must contribute FLOPs."""
        from hesic_tpu.models import (HESICPlus, HESICPlusCodec,
                                      HESICPlusDeviceCodec)
        module = HESICPlus(N=16, M=24)
        base = HESICPlusCodec.init(
            module, [(2, 64, 64, 3), (2, 64, 64, 3), (2, 3, 3)])
        base.update()
        codec = HESICPlusDeviceCodec(base, mm=8, groups=4)
        fl = codec.device_flops(64, 64, batch=2)
        for name in ("enc_transforms", "chain", "dec_out"):
            assert fl["per_program"][name] > 0, name
        assert fl["flops_per_pair"] > fl["per_program"]["chain"] / 2


class TestNonSquare:
    def test_wavefront_non_square(self):
        codec = _codec(seed=7)
        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32)
        out = codec.compress(x)
        rec = codec.decompress(out["strings"])
        np.testing.assert_array_equal(np.asarray(rec["y_hat"]),
                                      np.asarray(out["y_hat"]))

    def test_non_x64_rejected(self):
        codec = _codec(seed=7)
        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
        with pytest.raises(ValueError, match="multiples of 64"):
            codec.compress(x)
