"""Remaining BASELINE.json config coverage.

- "cartpole batched 4096-wide, fixed-seed trajectory match": wide batches
  reproduce bitwise and agree with single-env rollouts
- "humanoid spherical joints, end-to-end jax.grad sys-id": gradients
  through a spherical-joint rollout are finite and match finite differences
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.dynamics import forward_dynamics, integrate_euler

REF_DATA = "/root/reference/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not mounted"
)


def test_cartpole_4096_wide_fixed_seed_match():
    from tds_tpu.envs.cartpole import CartpoleEnv
    from tds_tpu.envs.vectorized import VectorizedEnv

    env = CartpoleEnv()
    venv = VectorizedEnv(env, num_envs=4096, auto_reset=False)

    def batch_rollout():
        states, obs = venv.reset(jax.random.PRNGKey(7))
        actions = jnp.zeros((4096, 1))

        def body(carry, _):
            states = carry
            states, obs, r, d = venv.step(states, actions)
            return states, obs

        states, traj = jax.lax.scan(body, states, None, length=50)
        return traj

    t1 = batch_rollout()
    t2 = batch_rollout()
    # bitwise reproducible at 4096-wide
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    # batched equals single-env stepping for matching reset keys
    keys = jax.random.split(jax.random.PRNGKey(7), 4096)
    for idx in (0, 1234, 4095):
        state, obs = env.reset(keys[idx])
        for t in range(50):
            state, obs, r, d = env.step(state, jnp.zeros(1))
            np.testing.assert_allclose(
                np.asarray(t1[t, idx]), np.asarray(obs), atol=1e-12
            )


@needs_ref
def test_humanoid_spherical_grad_sysid():
    """jax.grad through a spherical-joint humanoid rollout wrt a mass-scale
    parameter, validated against central differences."""
    from tds_tpu.urdf.cache import construct

    model, _ = construct("humanoid_xyz_spherical.urdf")
    gravity = jnp.array([0.0, 0.0, -9.81])
    q0 = model.zero_q()
    qd0 = model.zero_qd()
    tau = jnp.zeros(model.dof_actuated)

    def loss(mass_scale):
        # scale a single link's inertial properties (uniform scaling of
        # every mass leaves unforced dynamics invariant)
        scale = jnp.ones(model.num_links).at[5].set(mass_scale)
        m = model.replace(
            mass=model.mass * scale,
            com=model.com * scale[:, None],
            inertia=model.inertia * scale[:, None, None],
        )

        def step(carry, _):
            q, qd = carry
            qdd = forward_dynamics(m, q, qd, tau, gravity)
            return integrate_euler(m, q, qd, qdd, 1e-3), None

        (q, qd), _ = jax.lax.scan(step, (q0, qd0), None, length=100)
        return jnp.sum(q**2)

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g))
    eps = 1e-5
    fd = (loss(1.0 + eps) - loss(1.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3, atol=1e-6)
