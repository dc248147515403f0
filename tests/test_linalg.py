"""Unrolled small-dense linear algebra vs numpy."""

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.algebra.linalg import (
    cho_solve_unrolled,
    cholesky_unrolled,
    inv3,
    inv_pd,
    solve_pd,
)


def _spd(n, batch=(), seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=batch + (n, n))
    return jnp.asarray(a @ np.swapaxes(a, -1, -2) + n * np.eye(n))


def test_inv3():
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.normal(size=(7, 3, 3)) + 2 * np.eye(3))
    np.testing.assert_allclose(inv3(m), np.linalg.inv(np.asarray(m)), rtol=1e-9, atol=1e-9)


def test_cholesky_matches_numpy():
    for n in (1, 4, 18):
        a = _spd(n, batch=(5,), seed=n)
        l = cholesky_unrolled(a)
        np.testing.assert_allclose(
            l, np.linalg.cholesky(np.asarray(a)), rtol=1e-9, atol=1e-9
        )


def test_solve_vector_and_matrix():
    a = _spd(12, batch=(3,), seed=1)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.normal(size=(3, 12)))
    x = solve_pd(a, b)
    np.testing.assert_allclose(
        x, np.linalg.solve(np.asarray(a), np.asarray(b)[..., None])[..., 0],
        rtol=1e-8, atol=1e-9,
    )
    bm = jnp.asarray(rng.normal(size=(3, 12, 5)))
    xm = cho_solve_unrolled(cholesky_unrolled(a), bm)
    np.testing.assert_allclose(
        xm, np.linalg.solve(np.asarray(a), np.asarray(bm)), rtol=1e-8, atol=1e-9
    )


def test_inv_pd():
    a = _spd(9, seed=5)
    np.testing.assert_allclose(
        inv_pd(a), np.linalg.inv(np.asarray(a)), rtol=1e-8, atol=1e-9
    )


def test_gradients_flow():
    a = _spd(6, seed=7)
    b = jnp.ones(6)
    g = jax.grad(lambda a_: jnp.sum(solve_pd(a_, b) ** 2))(a)
    assert np.all(np.isfinite(np.asarray(g)))
