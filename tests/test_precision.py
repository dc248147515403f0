"""f32 (TPU throughput dtype) vs f64 (correctness dtype) divergence bounds.

BASELINE.md requires double-precision trajectory match (delivered by the
golden tests in f64) with throughput measured in f32 under tolerance-based
validation. This suite quantifies the f32 envelope on the benchmark
workload: single-step accelerations and short standing trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.dynamics import forward_dynamics, integrate_euler
from tds_tpu.model.pendulum import compound_pendulum

GRAVITY = jnp.array([0.0, 0.0, -9.81])


def test_single_step_f32_error_bounded():
    m64 = compound_pendulum(5, dtype=jnp.float64)
    m32 = compound_pendulum(5, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    worst = 0.0
    for _ in range(10):
        q = rng.normal(size=5) * 0.6
        qd = rng.normal(size=5) * 0.5
        tau = rng.normal(size=5)
        qdd64 = forward_dynamics(
            m64, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(tau), GRAVITY
        )
        qdd32 = forward_dynamics(
            m32,
            jnp.asarray(q, jnp.float32),
            jnp.asarray(qd, jnp.float32),
            jnp.asarray(tau, jnp.float32),
            GRAVITY.astype(jnp.float32),
        )
        rel = np.abs(np.asarray(qdd32, np.float64) - np.asarray(qdd64)) / (
            1.0 + np.abs(np.asarray(qdd64))
        )
        worst = max(worst, rel.max())
    # single-step f32 error stays within ~100x f32 eps
    assert worst < 2e-5, worst


def test_short_trajectory_f32_divergence():
    """200 steps of a (chaotic) pendulum: f32 divergence stays below the
    task-relevant tolerance (~1e-3 rad) on short horizons."""
    m64 = compound_pendulum(3, dtype=jnp.float64)
    m32 = compound_pendulum(3, dtype=jnp.float32)

    def rollout(model, dtype, n=200):
        q = jnp.asarray([0.8, -0.4, 0.3], dtype)
        qd = jnp.zeros(3, dtype)
        tau = jnp.zeros(3, dtype)

        def step(carry, _):
            q, qd = carry
            qdd = forward_dynamics(model, q, qd, tau, GRAVITY.astype(dtype))
            return integrate_euler(model, q, qd, qdd, dtype(1e-3)), None

        (q, qd), _ = jax.lax.scan(step, (q, qd), None, length=n)
        return np.asarray(q, np.float64)

    q64 = rollout(m64, jnp.float64)
    q32 = rollout(m32, jnp.float32)
    err = np.abs(q64 - q32).max()
    assert err < 1e-3, err
