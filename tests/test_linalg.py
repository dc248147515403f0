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


def test_tree_sparse_cholesky_matches_dense():
    """Reversed-order sparse factorization over the dof coupling mask must
    reproduce the dense solve exactly for tree mass matrices."""
    import os

    import pytest

    from tds_tpu.algebra.linalg import symbolic_cholesky_fill
    from tds_tpu.dynamics.mass_matrix import mass_matrix
    from tds_tpu.urdf.cache import construct

    if not os.path.isdir("/root/reference/data"):
        pytest.skip("reference data not mounted")
    rng = np.random.default_rng(0)
    for name in ["gym/ant_org_xyz_xyzrot.urdf", "humanoid_xyz_spherical.urdf"]:
        model, _ = construct(name)
        q = model.zero_q() + jnp.asarray(rng.normal(size=model.dof_q) * 0.1)
        m = mass_matrix(model, q)
        n = model.dof_qd
        # the coupling mask must cover every numerically-nonzero entry
        mask = model.dof_coupling_mask()
        assert np.all(np.abs(np.asarray(m))[~mask] < 1e-12), name
        patt = symbolic_cholesky_fill(mask[::-1, ::-1])
        m_rev = m[::-1, ::-1]
        l = cholesky_unrolled(m_rev, patt)
        b = jnp.asarray(rng.normal(size=(n, 4)))
        x = cho_solve_unrolled(l, b[::-1, :], patt)[::-1, :]
        x_dense = np.linalg.solve(np.asarray(m), np.asarray(b))
        np.testing.assert_allclose(np.asarray(x), x_dense, rtol=1e-8, atol=1e-9)
        # sparsity actually prunes something
        assert patt.sum() < n * (n + 1) // 2, name


def test_gradients_flow():
    a = _spd(6, seed=7)
    b = jnp.ones(6)
    g = jax.grad(lambda a_: jnp.sum(solve_pd(a_, b) ** 2))(a)
    assert np.all(np.isfinite(np.asarray(g)))
