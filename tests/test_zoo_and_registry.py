"""Zoo / coder-registry / misc-util tests (reference test_coder.py,
test_init.py, zoo loaders)."""

import numpy as np
import pytest

import hesic_tpu
from hesic_tpu.models.utils import (find_param, merge_params, param_count,
                                    tree_paths)
from hesic_tpu.utils.logging import AverageMeter, SpanTimer
from hesic_tpu.zoo import cfgs, create_model, model_architectures


class TestCoderRegistry:
    def test_default(self):
        assert hesic_tpu.get_entropy_coder() == "ans"
        assert "ans" in hesic_tpu.available_entropy_coders()

    def test_set_and_reject(self):
        hesic_tpu.set_entropy_coder("rangecoder")
        assert hesic_tpu.get_entropy_coder() == "rangecoder"
        hesic_tpu.set_entropy_coder("ans")
        with pytest.raises(ValueError):
            hesic_tpu.set_entropy_coder("huffman")
        with pytest.raises(ValueError):
            hesic_tpu.set_entropy_coder(0xFF)


class TestZoo:
    def test_all_archs_have_cfgs(self):
        assert set(model_architectures) == set(cfgs)

    def test_invalid_name_and_quality(self):
        with pytest.raises(ValueError):
            create_model("nonexistent")
        with pytest.raises(ValueError):
            create_model("bmshj2018-factorized", quality=99)

    def test_pretrained_missing_is_actionable(self, tmp_path, monkeypatch):
        """With no cached checkpoint and no URL, pretrained=True must
        name the exact paths it looked for."""
        monkeypatch.setenv("HESIC_ZOO_DIR", str(tmp_path))
        with pytest.raises(FileNotFoundError, match="bmshj2018-factorized"):
            create_model("bmshj2018-factorized", pretrained=True)

    def test_pretrained_loads_from_zoo_cache(self, tmp_path, monkeypatch):
        """pretrained=True resolves converted checkpoints from
        $HESIC_ZOO_DIR (the torch.hub cache analogue of the reference
        loaders, zoo/image.py:157-341) and restores config + params."""
        import pickle
        seed_codec = create_model("bmshj2018-factorized", quality=1,
                                  image_size=(64, 64), N=8, M=12)
        state = seed_codec.state_dict()
        path = tmp_path / "bmshj2018-factorized-q1-mse.pkl"
        with open(path, "wb") as f:
            pickle.dump(state, f)
        monkeypatch.setenv("HESIC_ZOO_DIR", str(tmp_path))
        codec = create_model("bmshj2018-factorized", quality=1,
                             pretrained=True)
        assert codec.module.N == 8 and codec.module.M == 12
        import jax
        la = jax.tree_util.tree_leaves(codec.params)
        lb = jax.tree_util.tree_leaves(seed_codec.params)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pretrained_converts_torch_checkpoint(self, tmp_path,
                                                  monkeypatch):
        """A torch .pth.tar in the zoo cache is converted on the fly
        (utils.convert_torch) and the .pkl conversion is cached."""
        import os
        import shutil
        pytest.importorskip("torch")
        src = os.path.join(os.path.dirname(__file__), "fixtures",
                           "ref_hsic_tiny.pth.tar")
        shutil.copy(src, tmp_path / "hesic-q1-mse.pth.tar")
        monkeypatch.setenv("HESIC_ZOO_DIR", str(tmp_path))
        codec = create_model("hesic", quality=1, pretrained=True,
                             N=8, M=16, K=2)
        assert codec.module.N == 8
        assert (tmp_path / "hesic-q1-mse.pkl").exists()
        codec2 = create_model("hesic", quality=1, pretrained=True,
                              N=8, M=16, K=2)
        import jax
        for a, b in zip(jax.tree_util.tree_leaves(codec.params),
                        jax.tree_util.tree_leaves(codec2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_create_small(self):
        codec = create_model("bmshj2018-factorized", quality=1,
                             image_size=(64, 64), N=8, M=12)
        assert codec.module.N == 8
        paths = tree_paths(codec.params)
        assert any("entropy_bottleneck" in p for p in paths)


class TestParamUtils:
    def test_find_and_count(self):
        tree = {"a": {"b": np.zeros((2, 3))}, "c": np.zeros(4)}
        assert find_param(tree, "a/b").shape == (2, 3)
        assert find_param(tree, "a/x") is None
        assert param_count(tree) == 10

    def test_merge_non_strict(self):
        base = {"a": {"b": 1, "c": 2}, "d": 3}
        out = merge_params(base, {"a": {"b": 10}, "e": 4})
        assert out["a"]["b"] == 10 and out["a"]["c"] == 2
        assert out["d"] == 3 and out["e"] == 4


class TestLogging:
    def test_average_meter_val_vs_avg(self):
        """The CVPR errata distinction: val is last, avg is mean."""
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.val == 3.0
        assert m.avg == 2.0

    def test_span_timer(self):
        import time
        spans = SpanTimer()
        with spans("x"):
            time.sleep(0.01)
        assert spans.meters["x"].avg >= 0.01
        assert "x:" in spans.report()
