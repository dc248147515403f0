"""Gym wrapper, domain randomization, distributed helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.envs.cartpole import CartpoleEnv


def test_gym_wrapper_api():
    gymnasium = pytest.importorskip("gymnasium")
    from tds_tpu.envs.gym_wrapper import GymEnv

    env = GymEnv(CartpoleEnv(), max_episode_steps=50)
    obs, info = env.reset(seed=3)
    assert obs.shape == (4,) and obs.dtype == np.float32
    total = 0
    for _ in range(60):
        obs, reward, terminated, truncated, info = env.step(
            env.action_space.sample()
        )
        total += reward
        if terminated or truncated:
            break
    assert total > 0
    assert terminated or truncated  # episode ends within the cap


def test_domain_randomization_batch():
    from tds_tpu.dynamics import forward_dynamics
    from tds_tpu.envs.domain_randomization import (
        RandomizationSpec,
        randomize_batch,
    )
    from tds_tpu.model.pendulum import compound_pendulum

    base = compound_pendulum(2)
    models = randomize_batch(
        base, jax.random.PRNGKey(0), 16,
        RandomizationSpec(mass_range=(0.5, 2.0)),
    )
    assert models.mass.shape == (16, 2)
    # scales within range and actually varied
    ratio = np.asarray(models.mass) / np.asarray(base.mass)
    assert ratio.min() >= 0.5 and ratio.max() <= 2.0
    assert ratio.std() > 0.05

    q = jnp.array([0.4, -0.2])
    qd = jnp.zeros(2)
    g = jnp.array([0.0, 0.0, -9.81])
    qdds = jax.vmap(
        lambda m: forward_dynamics(m, q, qd, jnp.zeros(2), g)
    )(models)
    assert qdds.shape == (16, 2)
    # different masses -> different accelerations
    assert np.asarray(qdds).std(axis=0).max() > 1e-3


def test_distributed_helpers_single_process():
    from tds_tpu.parallel.distributed import (
        global_mesh,
        initialize_distributed,
        is_primary,
        local_batch_size,
    )

    initialize_distributed()  # no-op single process
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert is_primary()
    assert local_batch_size(64) == 64
