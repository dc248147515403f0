"""Differentiation facade — the analog of src/utils/differentiation.hpp.

The reference dispatches 7 gradient engines (numerical, Ceres jets, dual
numbers, Stan fwd/rev, CppAD, CppAD-codegen) behind a DiffMethod enum
(differentiation.hpp:41-135). Under JAX one engine subsumes them:

=====================  =============================================
reference DiffMethod   here
=====================  =============================================
DIFF_NUMERICAL         :func:`gradient_fd` (central differences)
DIFF_CERES / DUAL /    ``jax.jacfwd`` (forward mode)
STAN_FORWARD
DIFF_STAN_REVERSE /    ``jax.grad`` / ``jax.jacrev`` (reverse mode)
DIFF_CPPAD_AUTO
DIFF_CPPAD_CODEGEN     ``jax.jit`` of the above (XLA codegen + caching
                       replaces the clang/.so pipeline)
=====================  =============================================

:class:`GradientFunctional` mirrors the reference's value()/gradient()
object API (differentiation.hpp:285-571) for porting code 1:1.
"""

import enum
from typing import Callable

import jax
import jax.numpy as jnp


class DiffMethod(enum.IntEnum):
    NUMERICAL = 0
    FORWARD = 1  # Ceres jet / dual / Stan-forward equivalents
    REVERSE = 2  # Stan-reverse / CppAD equivalents


def gradient_fd(f: Callable, eps: float = 1e-6):
    """Central-difference gradient (differentiation.hpp:140-156)."""

    def grad(x, *args):
        x = jnp.asarray(x)
        n = x.shape[-1]
        basis = jnp.eye(n, dtype=x.dtype)

        def one(e):
            return (f(x + eps * e, *args) - f(x - eps * e, *args)) / (2 * eps)

        return jax.vmap(one)(basis)

    return grad


class GradientFunctional:
    """value(x) / gradient(x) pair with jit compilation on first use.

    ``f``: scalar-valued function of a flat parameter vector (plus optional
    static args bound at construction).
    """

    def __init__(self, f: Callable, method: DiffMethod = DiffMethod.REVERSE,
                 compile: bool = True, fd_eps: float = 1e-6):
        self.method = DiffMethod(method)
        self._value = f
        if self.method == DiffMethod.NUMERICAL:
            grad = gradient_fd(f, fd_eps)
        elif self.method == DiffMethod.FORWARD:
            grad = jax.jacfwd(f)
        else:
            grad = jax.grad(f)
        if compile:
            self._value = jax.jit(f)
            if self.method != DiffMethod.NUMERICAL:
                grad = jax.jit(grad)
        self._grad = grad

    def value(self, x, *args):
        return self._value(jnp.asarray(x), *args)

    def gradient(self, x, *args):
        return self._grad(jnp.asarray(x), *args)


def check_gradient(f: Callable, x, rtol: float = 1e-4, atol: float = 1e-6,
                   eps: float = 1e-6):
    """AD-vs-finite-difference verification (the test pattern of
    test_codegen.cpp:169-206). Returns (ad, fd, max_abs_err)."""
    import numpy as np

    ad = jax.grad(f)(x)
    fd = gradient_fd(f, eps)(x)
    err = float(jnp.max(jnp.abs(ad - fd)))
    np.testing.assert_allclose(ad, fd, rtol=rtol, atol=atol)
    return ad, fd, err
