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


def test_pgs_impl_flag_through_resolve_collision():
    """The pgs_impl="pallas" branch of the MLCP solver (wired round 3 after
    the axon plugin's Pallas execution started working) produces the same
    post-contact velocities as the default XLA path on a batched
    sphere-on-plane problem. Interpret mode on CPU; on-TPU parity was
    measured at 6e-8 with 1.02x throughput (contact/pallas_pgs.py STATUS).
    """
    from tds_tpu.contact.mlcp import ContactSolverParams
    from tds_tpu.envs.laikago import LaikagoEnv

    batch = 8
    outs = {}
    for impl in ("xla", "pallas"):
        env = LaikagoEnv(
            dtype=jnp.float32, solver=ContactSolverParams(pgs_impl=impl)
        )
        q0, qd0 = env.initial_state(jax.random.PRNGKey(0))
        qs = jnp.tile(q0[None], (batch, 1))
        qds = jnp.tile(qd0[None], (batch, 1))
        qds = qds.at[:, 0].set(jnp.linspace(-0.5, 0.5, batch))  # vary envs
        act = jnp.zeros((batch, env.action_dim), jnp.float32)
        q, qd = qs, qds
        for _ in range(3):
            q, qd = env.sim_step(q, qd, act)
        outs[impl] = (np.asarray(q), np.asarray(qd))
    np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0], atol=2e-6)
    np.testing.assert_allclose(outs["pallas"][1], outs["xla"][1], atol=2e-5)
