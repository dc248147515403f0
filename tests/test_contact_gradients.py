"""Gradients through the flagship articulated MLCP contact path.

The reference's flagship gradient check differentiates a long LCP-contact
rollout (test_codegen.cpp:169-206, compiled gradients vs Ceres to 1e-9).
Here: jax.grad through a 500-step PD-driven laikago rollout with the MLCP
solver, compared against central finite differences (f64, CPU) for
- kp (controller gain),
- one link's density scale (mass + first moment + inertia together),
- the ground friction coefficient.

The robot starts with a forward slide so kinetic friction is engaged for
much of the rollout (keeps the LCP in a smooth regime where FD is a valid
oracle; stick-slip transitions are measure-zero kinks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.control.pd import pd_tau
from tds_tpu.dynamics.forward_dynamics import aba_factor, forward_dynamics_from_kin
from tds_tpu.dynamics.integrator import integrate_euler_qdd, integrate_q
from tds_tpu.dynamics.kinematics import fk_links
from tds_tpu.envs.laikago import LaikagoEnv
from tds_tpu.world import resolve_contacts

STEPS = 500


@pytest.fixture(scope="module")
def setup():
    env = LaikagoEnv()  # f64 under the suite's x64 config
    q0 = env.model.zero_q()
    off = env._joint_q_offset()
    q0 = q0.at[off : off + 12].set(env.initial_poses)
    q0 = q0.at[2].set(0.47)
    qd0 = env.model.zero_qd()
    qd0 = qd0.at[0].set(0.8)  # initial forward slide -> kinetic friction
    # one link with real mass (skip the massless base-emulation chain)
    link = int(np.argmax(np.asarray(env.model.mass) > 1e-6))
    return env, q0, qd0, link


def _make_loss(env, q0, qd0, link):
    model0 = env.model

    def loss(kp, mscale, friction):
        s = jnp.ones_like(model0.mass).at[link].set(mscale)
        model = model0.replace(
            mass=model0.mass * s,
            com=model0.com * s[:, None],
            inertia=model0.inertia * s[:, None, None],
        )
        world = env.world.replace(
            bodies=(env.world.bodies[0], model),
            solver=env.world.solver._replace(friction=friction),
            friction_mode="world_default",
        )

        def step(carry, _):
            q, qd = carry
            tau = pd_tau(
                model, q, qd, env.initial_poses, kp, env.kd, env.max_force,
                skip_links=env.skip_links,
            )
            kin = fk_links(model, q, qd)
            factor = aba_factor(model, kin)
            qdd = forward_dynamics_from_kin(
                model, kin, q, qd, tau, env.gravity, factor=factor
            )
            qd = integrate_euler_qdd(model, q, qd, qdd, env.dt)
            zero = jnp.zeros((0,), q.dtype)
            qds = resolve_contacts(
                world, (zero, q), (zero, qd), env.dt,
                kins=[None, kin], factors=[None, factor],
            )
            q, qd = integrate_q(model, q, qds[1], env.dt)
            return (q, qd), q[2]

        (q, qd), heights = jax.lax.scan(step, (q0, qd0), None, length=STEPS)
        # slide distance + mean stance height: sensitive to friction, kp, mass
        return q[0] + jnp.mean(heights)

    return loss


def test_grad_matches_fd_through_mlcp_rollout(setup):
    env, q0, qd0, link = setup
    loss = _make_loss(env, q0, qd0, link)
    loss_j = jax.jit(loss)

    kp, ms, mu = 100.0, 1.0, 0.5
    g_kp, g_ms, g_mu = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(kp, ms, mu)

    def fd(f, x, eps):
        return (f(x + eps) - f(x - eps)) / (2 * eps)

    fd_kp = fd(lambda x: loss_j(x, ms, mu), kp, 1e-3)
    fd_ms = fd(lambda x: loss_j(kp, x, mu), ms, 1e-5)
    fd_mu = fd(lambda x: loss_j(kp, ms, x), mu, 1e-5)

    # the loss actually depends on every parameter
    assert abs(float(g_mu)) > 1e-3, "friction gradient vanished"
    assert abs(float(g_kp)) > 1e-6
    assert abs(float(g_ms)) > 1e-4

    np.testing.assert_allclose(float(g_kp), float(fd_kp), rtol=2e-4)
    np.testing.assert_allclose(float(g_ms), float(fd_ms), rtol=2e-4)
    np.testing.assert_allclose(float(g_mu), float(fd_mu), rtol=2e-4)


def test_friction_sysid_direction(setup):
    """One gradient step on a trajectory-matching loss moves the friction
    estimate toward the true value (the sys-id-through-contact workflow;
    full demo in examples/friction_sys_id.py)."""
    env, q0, qd0, link = setup
    loss = _make_loss(env, q0, qd0, link)

    true_mu = 0.7
    target = jax.jit(loss)(100.0, 1.0, true_mu)

    def cost(mu):
        return (loss(100.0, 1.0, mu) - target) ** 2

    for mu0 in (0.4, 0.9):
        g = float(jax.jit(jax.grad(cost))(mu0))
        assert np.isfinite(g)
        # descending the cost moves mu toward true_mu
        assert np.sign(-g) == np.sign(true_mu - mu0), (mu0, g)
