"""Param-tree helpers.

Functional equivalents of the reference's module/buffer utilities
(models/utils.py:19-101): path-based lookup replaces named_modules
traversal, and explicit CdfTables state (entropy_models/codec.py) replaces
the resize-if-empty dynamic buffer dance (`update_registered_buffers`) —
Flax param trees are plain pytrees, so no in-place resizing is needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def find_param(params: dict, path: str) -> Optional[Any]:
    """Look up a parameter by 'a/b/c' path; None when absent."""
    node = params
    for part in path.split("/"):
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node


def param_count(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def tree_paths(params) -> list[str]:
    """All leaf paths as 'a/b/c' strings."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in flat
    ]


def merge_params(base: dict, override: dict) -> dict:
    """Recursively overlay `override` onto `base` (non-strict load —
    the reference's non-strict checkpoint filter, test2_codec.py:415-420)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
