"""CRBA / RNEA / Jacobian consistency tests.

Key identities (standard rigid-body dynamics, independent of implementation):
- ABA <-> RNEA inverse: ID(q, qd, FD(q, qd, tau)) == tau
- CRBA == RNEA columns: M[:, j] = ID(q, 0, e_j, g=0)
- analytic Jacobian == finite-difference Jacobian, and J qd == point velocity
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.dynamics.forward_dynamics import forward_dynamics
from tds_tpu.dynamics.inverse_dynamics import inverse_dynamics
from tds_tpu.dynamics.jacobian import point_jacobian, point_jacobian_fd
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.dynamics.mass_matrix import mass_matrix
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyBuilder
from tds_tpu.model.pendulum import compound_pendulum

GRAVITY = jnp.array([0.0, 0.0, -9.81])


def _mixed_chain():
    """Fixed-base chain with revolute, prismatic, fixed and axis joints."""
    b = MultiBodyBuilder(name="mixed")
    b.add_link(JointType.REVOLUTE_X, -1, x_t_pos=(0, 0, 0.1), mass=1.0,
               com=(0, 0.1, -0.2), inertia_about_com=np.diag([0.02, 0.03, 0.01]))
    b.add_link(JointType.PRISMATIC_Z, 0, x_t_pos=(0, 0.1, -0.3), mass=0.5,
               com=(0.05, 0, -0.1), inertia_about_com=np.diag([0.01, 0.01, 0.005]))
    b.add_link(JointType.FIXED, 1, x_t_pos=(0.1, 0, -0.1), x_t_rpy=(0.3, -0.2, 0.5),
               mass=0.3, com=(0, 0, -0.05), inertia_about_com=np.diag([0.004, 0.004, 0.002]))
    b.add_link(JointType.REVOLUTE_AXIS, 2, x_t_pos=(0, 0, -0.15),
               axis=(0.36, 0.48, 0.8), mass=0.7, com=(0, 0.02, -0.2),
               inertia_about_com=np.diag([0.015, 0.012, 0.008]))
    b.add_link(JointType.PRISMATIC_AXIS, 3, x_t_pos=(0, 0.05, -0.2),
               axis=(0.6, 0, 0.8), mass=0.2, com=(0, 0, -0.05),
               inertia_about_com=np.diag([0.002, 0.002, 0.001]))
    return b.finalize()


def _floating_chain():
    b = MultiBodyBuilder(is_floating=True, name="floatchain")
    b.set_base_inertia(2.0, (0.01, -0.02, 0.03), np.diag([0.2, 0.25, 0.3]))
    b.add_link(JointType.REVOLUTE_Y, -1, x_t_pos=(0.1, 0, -0.2), mass=1.0,
               com=(0, 0, -0.25), inertia_about_com=np.diag([0.05, 0.05, 0.01]))
    b.add_link(JointType.REVOLUTE_Z, 0, x_t_pos=(0, 0, -0.5), mass=0.8,
               com=(0, 0.1, -0.2), inertia_about_com=np.diag([0.03, 0.02, 0.01]))
    return b.finalize()


def _spherical_chain():
    b = MultiBodyBuilder(name="spherical")
    b.add_link(JointType.SPHERICAL, -1, x_t_pos=(0, 0, -0.1), mass=1.0,
               com=(0, 0, -0.3), inertia_about_com=np.diag([0.04, 0.04, 0.01]))
    b.add_link(JointType.REVOLUTE_X, 0, x_t_pos=(0, 0, -0.5), mass=0.5,
               com=(0, 0, -0.2), inertia_about_com=np.diag([0.02, 0.02, 0.005]))
    return b.finalize()


@pytest.mark.parametrize("make", [_mixed_chain, _spherical_chain])
def test_aba_rnea_roundtrip_fixed_base(make):
    model = make()
    rng = np.random.default_rng(7)
    for _ in range(5):
        q = model.zero_q()
        # randomize, keeping quaternions normalized
        qr = rng.normal(size=model.dof_q) * 0.5
        q = q + jnp.asarray(qr)
        for i, jt in enumerate(model.joint_types):
            if jt == JointType.SPHERICAL:
                off = model.q_offsets[i]
                quat = q[off : off + 4]
                q = q.at[off : off + 4].set(quat / jnp.linalg.norm(quat))
        qd = jnp.asarray(rng.normal(size=model.dof_qd))
        tau = jnp.asarray(rng.normal(size=model.dof_actuated))
        qdd = forward_dynamics(model, q, qd, tau, GRAVITY)
        tau_rec = inverse_dynamics(model, q, qd, qdd, GRAVITY)
        np.testing.assert_allclose(tau_rec, tau, rtol=1e-9, atol=1e-9)


def test_aba_rnea_roundtrip_floating_identity_orientation():
    model = _floating_chain()
    rng = np.random.default_rng(11)
    q = model.zero_q().at[4:7].set(jnp.asarray(rng.normal(size=3)))
    q = q.at[7:].set(jnp.asarray(rng.normal(size=model.dof_q - 7) * 0.3))
    qd = model.zero_qd().at[3:].set(jnp.asarray(rng.normal(size=model.dof_qd - 3) * 0.2))
    tau = jnp.asarray(rng.normal(size=model.dof_actuated))
    qdd = forward_dynamics(model, q, qd, tau, GRAVITY)
    tau_rec, base_wrench = inverse_dynamics(
        model, q, qd, qdd, GRAVITY, return_base_wrench=True
    )
    np.testing.assert_allclose(tau_rec, tau, rtol=1e-8, atol=1e-8)
    # unforced base must need zero external wrench
    np.testing.assert_allclose(base_wrench, np.zeros(6), atol=1e-8)


@pytest.mark.parametrize("make", [_mixed_chain, _spherical_chain])
def test_crba_matches_rnea_columns(make):
    model = make()
    rng = np.random.default_rng(3)
    q = model.zero_q() + jnp.asarray(rng.normal(size=model.dof_q) * 0.4)
    for i, jt in enumerate(model.joint_types):
        if jt == JointType.SPHERICAL:
            off = model.q_offsets[i]
            quat = q[off : off + 4]
            q = q.at[off : off + 4].set(quat / jnp.linalg.norm(quat))
    m = mass_matrix(model, q)
    n = model.dof_qd
    # symmetry + positive definiteness
    np.testing.assert_allclose(m, np.asarray(m).T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(np.asarray(m)) > 0)
    # columns via RNEA with zero gravity/velocity
    qd0 = jnp.zeros(n)
    for j in range(n):
        ej = jnp.zeros(n).at[j].set(1.0)
        col = inverse_dynamics(model, q, qd0, ej, jnp.zeros(3))
        np.testing.assert_allclose(m[:, j], col, rtol=1e-9, atol=1e-10)


def test_crba_floating_matches_rnea():
    model = _floating_chain()
    rng = np.random.default_rng(5)
    q = model.zero_q().at[7:].set(jnp.asarray(rng.normal(size=model.dof_q - 7) * 0.4))
    m = mass_matrix(model, q)
    np.testing.assert_allclose(m, np.asarray(m).T, atol=1e-10)
    n = model.dof_qd
    for j in range(n):
        ej = jnp.zeros(n).at[j].set(1.0)
        tau_col, wrench_col = inverse_dynamics(
            model, q, jnp.zeros(n), ej, jnp.zeros(3), return_base_wrench=True
        )
        col = jnp.concatenate([wrench_col, tau_col])
        np.testing.assert_allclose(m[:, j], col, rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("make", [_mixed_chain, _spherical_chain, _floating_chain])
def test_point_jacobian_vs_finite_difference(make):
    model = make()
    rng = np.random.default_rng(13)
    q = model.zero_q() + jnp.asarray(rng.normal(size=model.dof_q) * 0.2)
    for i, jt in enumerate(model.joint_types):
        if jt == JointType.SPHERICAL:
            off = model.q_offsets[i]
            quat = q[off : off + 4]
            q = q.at[off : off + 4].set(quat / jnp.linalg.norm(quat))
    if model.is_floating:
        quat = q[0:4]
        q = q.at[0:4].set(quat / jnp.linalg.norm(quat))
    link = model.num_links - 1
    _, links_x_world, _ = forward_kinematics_q(model, q)
    point = links_x_world[link].apply_point(jnp.array([0.05, -0.02, -0.1]))
    jac = point_jacobian(model, q, link, point)
    jac_fd = point_jacobian_fd(model, q, link, point, eps=1e-6)
    np.testing.assert_allclose(jac, jac_fd, rtol=1e-4, atol=1e-5)


def test_jacobian_times_qd_is_point_velocity():
    """J(q) qd must equal d/dt of the world point position along the motion."""
    model = compound_pendulum(3)
    q = jnp.array([0.4, -0.7, 0.2])
    qd = jnp.array([1.0, -0.5, 0.3])
    link = 2
    local_pt = jnp.array([0.0, 0.0, -0.5])

    def world_point(qv):
        _, lxw, _ = forward_kinematics_q(model, qv)
        return lxw[link].apply_point(local_pt)

    p0 = world_point(q)
    jac = point_jacobian(model, q, link, p0)
    v_jac = jac @ qd
    v_ad = jax.jvp(world_point, (q,), (qd,))[1]
    np.testing.assert_allclose(v_jac, v_ad, rtol=1e-9, atol=1e-10)
