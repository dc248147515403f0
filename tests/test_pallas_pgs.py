"""Pallas PGS kernel vs the reference unrolled implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.contact.mlcp import solve_pgs
from tds_tpu.contact.pallas_pgs import solve_pgs_pallas


def _random_problem(bsz, n_c, seed=0):
    rng = np.random.default_rng(seed)
    n = 3 * n_c
    j = rng.normal(size=(bsz, n, 8))
    a = jnp.asarray(j @ np.swapaxes(j, -1, -2) + 1e-3 * np.eye(n))
    b = jnp.asarray(rng.normal(size=(bsz, n)))
    lo = jnp.concatenate(
        [jnp.zeros((bsz, n_c))] + [jnp.full((bsz, n_c), -0.5)] * 2, axis=-1
    )
    hi = jnp.concatenate(
        [jnp.full((bsz, n_c), 1e5)] + [jnp.full((bsz, n_c), 0.5)] * 2, axis=-1
    )
    dep = [-1] * n_c + list(range(n_c)) * 2
    return a, b, lo, hi, dep


def test_pallas_pgs_matches_unrolled():
    a, b, lo, hi, dep = _random_problem(32, 4)
    x0 = jnp.zeros_like(b)
    expected = jax.vmap(
        lambda a_, b_, lo_, hi_: solve_pgs(a_, b_, lo_, hi_, dep, jnp.zeros_like(b_), 3)
    )(a, b, lo, hi)
    got = solve_pgs_pallas(a, b, lo, hi, dep, iterations=3, block_batch=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6)


def test_pallas_pgs_nonmultiple_batch():
    a, b, lo, hi, dep = _random_problem(21, 2, seed=3)
    expected = jax.vmap(
        lambda a_, b_, lo_, hi_: solve_pgs(a_, b_, lo_, hi_, dep, jnp.zeros_like(b_), 2)
    )(a, b, lo, hi)
    got = solve_pgs_pallas(a, b, lo, hi, dep, iterations=2, block_batch=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6)
