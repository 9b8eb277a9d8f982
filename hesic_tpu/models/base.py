"""Host-side model wrapper: flax module + params + integer coder tables.

The reference couples these inside nn.Module state (CompressionModel,
models/priors.py:36-102, with dynamically-resized CDF buffers).  Here the
traced module stays pure; this wrapper owns the trained params and the
numpy CDF tables, implements ``update()``/``aux_loss()``, provides cached
jitted entry points for the codec flows, and (de)serializes everything.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy_models import (CdfTables, EntropyBottleneck,
                              compress_with_indexes, decompress_with_indexes,
                              gaussian_tables, get_scale_table,
                              tables_from_pmf)


class CompressionModel:
    """Pairs a flax module with trained params and host coder state."""

    def __init__(self, module, params):
        self.module = module
        # accept {'params': tree} or the bare tree
        if isinstance(params, dict) and set(params.keys()) <= {
                "params"} and "params" in params:
            params = params["params"]
        self.params = params
        self.tables: Dict[str, CdfTables] = {}
        self.scale_table: Optional[np.ndarray] = None
        self._jitted: Dict[str, Any] = {}

    # ---- construction ----

    @classmethod
    def init(cls, module, input_shapes, seed: int = 0):
        """Initialize fresh params by tracing the module once."""
        rngs = {"params": jax.random.PRNGKey(seed),
                "noise": jax.random.PRNGKey(seed + 1)}
        dummies = [jnp.zeros(s, jnp.float32) for s in input_shapes]
        variables = module.init(rngs, *dummies, training=True)
        return cls(module, variables["params"])

    # ---- pure apply helpers ----

    def apply(self, *args, method=None, rngs=None, **kwargs):
        return self.module.apply({"params": self.params}, *args,
                                 method=method, rngs=rngs, **kwargs)

    def jit(self, method: str):
        """Cached jitted `module.apply(..., method=method)` (eval mode)."""
        fn = self._jitted.get(method)
        if fn is None:
            module = self.module

            @jax.jit
            def fn(variables, *args):
                return module.apply(variables, *args, method=method)

            self._jitted[method] = fn
        return lambda *args: fn({"params": self.params}, *args)

    def forward(self, *args, training: bool = False, rngs=None):
        return self.module.apply({"params": self.params}, *args,
                                 training=training, rngs=rngs)

    def aux_loss(self):
        return self.module.apply({"params": self.params}, method="aux_loss")

    # ---- entropy-bottleneck host codec ----

    def _eb_subparams(self, name: str):
        parts = name.split("/")
        p = self.params
        for part in parts:
            p = p[part]
        return p

    def eb_medians(self, name: str) -> np.ndarray:
        # cached: params live on device, so the naive slice+fetch costs a
        # full host round-trip (~27 ms) per call
        cache = getattr(self, "_median_cache", None)
        if cache is None:
            cache = self._median_cache = {}
        if name not in cache:
            sub = self._eb_subparams(name)
            cache[name] = np.asarray(sub["quantiles"][:, 0, 1])
        return cache[name]

    def update(self, scale_table=None, force: bool = False):
        """(Re)build integer CDF tables for all entropy models.

        Reference: models/priors.py:89-102 + 282-286.
        """
        for name in getattr(self.module, "entropy_bottlenecks", ()):
            if name in self.tables and not force:
                continue
            sub = self._eb_subparams(name)
            channels = sub["quantiles"].shape[0]
            eb = EntropyBottleneck(channels=channels)
            pmf, tail, length, offset = eb.apply({"params": sub},
                                                 method="pmf_data")
            self.tables[name] = tables_from_pmf(
                np.asarray(pmf), np.asarray(tail), np.asarray(length),
                np.asarray(offset))
        gc_names = getattr(self.module, "gaussian_conditionals", ())
        if gc_names:
            if self.scale_table is None or scale_table is not None or force:
                table = (np.asarray(scale_table) if scale_table is not None
                         else get_scale_table())
                self.scale_table = table
                gc_tables = gaussian_tables(table)
                for name in gc_names:
                    self.tables[name] = gc_tables
        return self

    def eb_compress(self, name: str, z) -> list[bytes]:
        """Real-coder compress through the named entropy bottleneck.

        z: (B, h, w, C) array.  Reference: entropy_models.py:413-423.
        Symbols are emitted CHANNEL-major (the reference flattens NCHW),
        so our z streams are byte-identical to — and cross-decodable
        with — the reference's at equal symbols.
        """
        z = np.asarray(z)
        medians = self.eb_medians(name)
        symbols = np.round(z - medians).astype(np.int32)
        symbols = np.ascontiguousarray(symbols.transpose(0, 3, 1, 2))
        indexes = np.broadcast_to(
            np.arange(z.shape[-1], dtype=np.int32)[:, None, None],
            symbols.shape)
        return compress_with_indexes(symbols, indexes, self.tables[name])

    def eb_decompress(self, name: str, strings: list[bytes],
                      spatial_shape) -> jnp.ndarray:
        h, w = int(spatial_shape[0]), int(spatial_shape[1])
        medians = self.eb_medians(name)
        c = medians.shape[0]
        shape = (len(strings), c, h, w)      # reference NCHW symbol order
        indexes = np.broadcast_to(
            np.arange(c, dtype=np.int32)[:, None, None], shape)
        symbols = decompress_with_indexes(strings, indexes, self.tables[name])
        symbols = symbols.transpose(0, 2, 3, 1)
        return jnp.asarray(symbols.astype(np.float32) + medians)

    def gc_compress(self, name: str, y, indexes, means=None) -> list[bytes]:
        """Gaussian-conditional compress given prebuilt scale-table
        indexes.  y/indexes/means: (B, h, w, C); symbols emitted
        channel-major (reference NCHW flatten order)."""
        y = np.asarray(y)
        if means is not None:
            symbols = np.round(y - np.asarray(means)).astype(np.int32)
        else:
            symbols = np.round(y).astype(np.int32)
        symbols = np.ascontiguousarray(symbols.transpose(0, 3, 1, 2))
        indexes = np.ascontiguousarray(
            np.asarray(indexes).transpose(0, 3, 1, 2))
        return compress_with_indexes(symbols, indexes, self.tables[name])

    def gc_decompress(self, name: str, strings: list[bytes], indexes,
                      means=None) -> jnp.ndarray:
        indexes = np.ascontiguousarray(
            np.asarray(indexes).transpose(0, 3, 1, 2))
        symbols = decompress_with_indexes(strings, indexes,
                                          self.tables[name])
        out = symbols.transpose(0, 2, 3, 1).astype(np.float32)
        if means is not None:
            out = out + np.asarray(means)
        return jnp.asarray(out)

    # ---- persistence ----

    def config(self) -> dict:
        cfg = {}
        for field in ("N", "M", "K", "F", "C"):
            if hasattr(self.module, field):
                cfg[field] = getattr(self.module, field)
        return cfg

    def state_dict(self) -> dict:
        return {
            "module_class": type(self.module).__name__,
            "config": self.config(),
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "tables": {k: v.state_dict() for k, v in self.tables.items()},
            "scale_table": self.scale_table,
        }

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self.state_dict(), f)

    def load_state_dict(self, state: dict):
        self._median_cache = {}
        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        self.tables = {k: CdfTables.from_state_dict(v)
                       for k, v in state.get("tables", {}).items()}
        st = state.get("scale_table")
        self.scale_table = None if st is None else np.asarray(st)
        self._jitted.clear()
        return self

    @classmethod
    def load(cls, module, path: str) -> "CompressionModel":
        with open(path, "rb") as f:
            state = pickle.load(f)
        return cls(module, state["params"]).load_state_dict(state)


class TogetherCodec(CompressionModel):
    """Codec for the m1+m2 "Together" wrappers (HESIC/HESIC+/DSIC + stage-2
    enhancement; reference newnet1.py:1304-1321, newnet1_joint.py:1351,
    mynet6_plus.py:1352-1370).

    The inner m1 sub-model does all the real coding — compress delegates to
    an inner codec built over the ``m1`` params subtree — and the ``m2``
    enhancement is applied to both reconstructions after decompress, exactly
    as the reference wrappers run enhancement outside the codec flow.
    """

    inner_codec_cls: type = None  # CompressionModel subclass coding m1
    enhance_with_h: bool = True   # m2 signature: (x1, x2, h) vs (x1, x2)
    _inner = None

    def _make_inner_module(self):
        raise NotImplementedError

    @property
    def inner(self) -> CompressionModel:
        if self._inner is None:
            inner = self.inner_codec_cls(self._make_inner_module(),
                                         self.params["m1"])
            inner.tables = {k[len("m1/"):]: v for k, v in self.tables.items()
                            if k.startswith("m1/")}
            inner.scale_table = self.scale_table
            self._inner = inner
        return self._inner

    def update(self, scale_table=None, force: bool = False):
        self.inner.update(scale_table=scale_table, force=force)
        self.tables = {f"m1/{k}": v for k, v in self.inner.tables.items()}
        self.scale_table = self.inner.scale_table
        return self

    def load_state_dict(self, state: dict):
        super().load_state_dict(state)
        self._inner = None
        return self

    def compress(self, *args, **kwargs):
        return self.inner.compress(*args, **kwargs)

    def _enhance(self, out: dict) -> dict:
        """Apply the m2 enhancement to a decompress result, keeping the
        pre-enhancement reconstructions under *_base."""
        if self.enhance_with_h:
            enh = self.jit("enhance")(out["x1_hat"], out["x2_hat"],
                                      out["h_matrix"])
        else:
            enh = self.jit("enhance")(out["x1_hat"], out["x2_hat"])
        return dict(out, x1_hat=enh["x1_hat"], x2_hat=enh["x2_hat"],
                    x1_hat_base=out["x1_hat"], x2_hat_base=out["x2_hat"])

    def decompress(self, *args, **kwargs):
        return self._enhance(self.inner.decompress(*args, **kwargs))

    def decompress_bytes(self, *args, **kwargs):
        return self._enhance(self.inner.decompress_bytes(*args, **kwargs))
