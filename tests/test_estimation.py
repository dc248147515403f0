"""Differentiation facade + sys-id estimation tests (the reference's
pendulum_sys_id.cpp / test_gradients.cpp analogs)."""

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.dynamics import forward_dynamics, integrate_euler
from tds_tpu.model.pendulum import compound_pendulum
from tds_tpu.utils.diff import DiffMethod, GradientFunctional, check_gradient
from tds_tpu.utils.estimation import (
    EstimationParameter,
    OptimizationProblem,
    adam_estimate,
    gradient_descent,
)

GRAVITY = jnp.array([0.0, 0.0, -9.81])


def test_gradient_functional_norm_squared():
    """Every DiffMethod returns grad ||x||^2 = 2x (test_gradients.cpp:18-67)."""
    f = lambda x: jnp.sum(x**2)
    x = jnp.asarray([1.0, -2.0, 3.0])
    for method in DiffMethod:
        gf = GradientFunctional(f, method=method)
        np.testing.assert_allclose(gf.value(x), 14.0, rtol=1e-12)
        np.testing.assert_allclose(gf.gradient(x), 2 * x, rtol=1e-5)


def test_check_gradient_through_rollout():
    """jax.grad through a 400-step pendulum rollout matches finite
    differences (test_codegen.cpp:169-206 pattern, sans contact)."""
    model = compound_pendulum(2)

    def loss(x):
        q = x[0:2]
        qd = x[2:4]

        def step(carry, _):
            q, qd = carry
            qdd = forward_dynamics(model, q, qd, jnp.zeros(2), GRAVITY)
            return integrate_euler(model, q, qd, qdd, 1e-3), None

        (q, qd), _ = jax.lax.scan(step, (q, qd), None, length=400)
        return jnp.sum(q**2) + 0.1 * jnp.sum(qd**2)

    check_gradient(loss, jnp.asarray([0.4, -0.3, 0.2, 0.1]), rtol=1e-4)


def test_pendulum_mass_sysid():
    """Recover a pendulum link mass from an observed trajectory by
    differentiating through the whole rollout (pendulum_sys_id.cpp:33)."""
    true_masses = [0.9, 1.7]
    target = compound_pendulum(2, masses=true_masses)
    q0 = jnp.array([0.8, -0.2])
    qd0 = jnp.zeros(2)

    def rollout(model, n=300):
        def step(carry, _):
            q, qd = carry
            qdd = forward_dynamics(model, q, qd, jnp.zeros(2), GRAVITY)
            return integrate_euler(model, q, qd, qdd, 1e-3), q

        (_, _), traj = jax.lax.scan(step, (q0, qd0), None, length=n)
        return traj

    observed = rollout(target)
    base = compound_pendulum(2)

    def cost(x):
        # model built FROM the parameters: masses scale both mass and the
        # first moment h = m*com and inertia (point masses)
        scale = x / base.mass
        m = base.replace(
            mass=x,
            com=base.com * scale[:, None],
            inertia=base.inertia * scale[:, None, None],
        )
        sim = rollout(m)
        return jnp.mean((sim - observed) ** 2)

    problem = OptimizationProblem(
        cost,
        [
            EstimationParameter("m0", 1.2, minimum=0.1, maximum=5.0),
            EstimationParameter("m1", 1.2, minimum=0.1, maximum=5.0),
        ],
    )
    x, c, history = adam_estimate(problem, learning_rate=0.05, iterations=150)
    assert c < 1e-6, (c, np.asarray(x))
    np.testing.assert_allclose(np.asarray(x), true_masses, rtol=0.05)


def test_gradient_descent_quadratic():
    problem = OptimizationProblem(
        lambda x: jnp.sum((x - 2.0) ** 2),
        [EstimationParameter("a", 0.0), EstimationParameter("b", 5.0)],
    )
    x, c, _ = gradient_descent(problem, learning_rate=0.2, iterations=100)
    np.testing.assert_allclose(np.asarray(x), [2.0, 2.0], atol=1e-3)
