"""Gradient reversal — identity forward, -alpha-scaled gradient backward.

JAX-native equivalent of the reference's autograd.Function
(/root/reference/mmpt/models/common/gradient_reversal.py:5): a one-line
custom_vjp instead of a Module.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, alpha: float = 1.0):
    return x


def _fwd(x, alpha):
    return x, None


def _bwd(alpha, _, g):
    return (jax.tree_util.tree_map(lambda t: -alpha * t, g),)


gradient_reversal.defvjp(_fwd, _bwd)
