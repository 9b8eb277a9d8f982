"""Bound operators with custom gradients.

Reference semantics: compressai/ops/bound_ops.py:19-52 — ``max(x, bound)``
whose gradient passes through iff the input is above the bound OR the
gradient pushes the output upward (toward satisfying the bound).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    """``jnp.maximum(x, bound)`` with the gradient gate of the reference.

    The derivative w.r.t. ``x`` is identity when ``x >= bound`` or when the
    incoming cotangent is negative (i.e. the optimizer wants to increase x),
    and zero otherwise.  ``bound`` receives a zero cotangent.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    gx = jnp.where(pass_through, g, jnp.zeros_like(g))
    return gx, jnp.zeros_like(jnp.asarray(bound, dtype=gx.dtype))


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def upper_bound(x, bound):
    """``jnp.minimum(x, bound)`` with the mirrored gradient gate."""
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _upper_bound_bwd(res, g):
    x, bound = res
    pass_through = (x <= bound) | (g > 0)
    gx = jnp.where(pass_through, g, jnp.zeros_like(g))
    return gx, jnp.zeros_like(jnp.asarray(bound, dtype=gx.dtype))


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)
