"""Gyroscopic dynamics oracles: torque-free precession, the Dzhanibekov
(intermediate-axis) instability, and Lagrange-top precession on a spherical
joint.

These pin the floating-base gyroscopic bias force (kinematics.hpp:54-61 /
tds_tpu/dynamics/kinematics.py) and the spherical-joint branch of ABA +
quaternion integration with CLOSED-FORM rigid-body mechanics, independent
of any golden file. The Lagrange top is also the regression test for the
round-3 joint_damping bug: the builder default was 0.0, and
pow(0, 1000*dt) = 0 silently froze every spherical joint at integration
time (reference default is 0.995, multi_body.hpp:51).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.dynamics.forward_dynamics import forward_dynamics
from tds_tpu.dynamics.integrator import integrate_euler
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyBuilder

DT = 1e-4


def _rot(qv):
    x, y, z, w = qv
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _free_body(inertia_diag):
    b = MultiBodyBuilder(is_floating=True, name="body")
    b.set_base_inertia(1.0, (0, 0, 0), np.diag(inertia_diag))
    return b.finalize()


def _spin(model, q0, qd0, steps, gravity=(0.0, 0.0, 0.0)):
    tau = jnp.zeros(model.dof_actuated, q0.dtype)
    g = jnp.asarray(gravity, q0.dtype)

    def step(carry, _):
        q, qd = carry
        qdd = forward_dynamics(model, q, qd, tau, g)
        q, qd = integrate_euler(model, q, qd, qdd, DT)
        return (q, qd), (q[:4], qd[:3])

    (_, _), (quats, omegas) = jax.lax.scan(
        step, (q0, qd0), None, length=steps
    )
    return np.asarray(quats), np.asarray(omegas)


def test_torque_free_precession():
    """Symmetric top in free fall: world angular momentum L is conserved
    and the symmetry axis precesses about L at |L|/I1 (Euler's equations,
    closed form for I1 = I2)."""
    I1, I3 = 0.2, 0.4
    m = _free_body([I1, I1, I3])
    qd0 = m.zero_qd().at[0].set(0.5).at[2].set(10.0)  # mostly spin about z
    quats, omegas = _spin(m, m.zero_q(), qd0, steps=5000)

    Ib = np.diag([I1, I1, I3])
    sub = slice(None, None, 100)
    rots = [_rot(qv) for qv in quats[sub]]
    # floating-base qd[0:3] is the WORLD-frame angular velocity
    Ls = np.array([R @ Ib @ R.T @ w for R, w in zip(rots, omegas[sub])])
    axes = np.array([R[:, 2] for R in rots])
    assert np.abs(Ls - Ls[0]).max() < 1e-2 * np.linalg.norm(Ls[0])

    lhat = Ls[0] / np.linalg.norm(Ls[0])
    e1 = np.cross(lhat, [1.0, 0, 0])
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(lhat, e1)
    # the axis cone around L has constant opening angle...
    assert np.std(axes @ lhat) < 1e-4
    # ...and rotates at the analytic rate
    phase = np.unwrap(np.arctan2(axes @ e2, axes @ e1))
    rate = (phase[-1] - phase[0]) / ((len(axes) - 1) * 100 * DT)
    analytic = np.linalg.norm(Ls[0]) / I1
    assert abs(rate - analytic) / analytic < 0.02, (rate, analytic)


def test_intermediate_axis_instability():
    """Dzhanibekov effect: spin about the intermediate inertia axis flips
    under an infinitesimal perturbation; spin about the major axis with the
    same perturbation stays aligned."""
    m = _free_body([0.1, 0.2, 0.3])
    # intermediate axis (y): 1e-3 perturbation flips within 2 s
    qd0 = m.zero_qd().at[1].set(10.0).at[0].set(1e-3)
    quats, _ = _spin(m, m.zero_q(), qd0, steps=20000)
    ydot = np.array([_rot(qv)[:, 1] @ [0, 1.0, 0] for qv in quats[::200]])
    assert ydot.min() < -0.9, f"no flip: min alignment {ydot.min():.3f}"

    # major axis (z): same perturbation, no flip
    qd0 = m.zero_qd().at[2].set(10.0).at[0].set(1e-3)
    quats, _ = _spin(m, m.zero_q(), qd0, steps=20000)
    zdot = np.array([_rot(qv)[:, 2] @ [0, 0, 1.0] for qv in quats[::200]])
    assert zdot.min() > 0.99, f"major axis wandered: {zdot.min():.3f}"


def test_lagrange_top_precession():
    """Heavy symmetric top on a SPHERICAL JOINT: steady precession at the
    slow root of I1' cos(th) W^2 - I3 w3 W + m g r = 0.

    Regression for the spherical joint_damping=0 freeze: before the fix
    the top did not move at all (pow(0, 1000*dt) zeroed qd, so measured
    precession was 0)."""
    r, mass, ws, th, gval = 0.1, 1.0, 50.0, 0.35, 9.81
    I3, I1 = 0.02, 0.05  # about the COM
    b = MultiBodyBuilder(name="top")
    b.joint_damping = 1.0  # conservative dynamics for the analytic check
    b.add_link(
        JointType.SPHERICAL, -1, mass=mass, com=(0, 0, r),
        inertia_about_com=np.diag([I1, I1, I3]),
    )
    m = b.finalize()

    I1p = I1 + mass * r * r  # about the pivot
    omega = mass * gval * r / (I3 * ws)
    for _ in range(20):  # fixed point incl. the w3 = ws + W cos(th) coupling
        w3 = ws + omega * math.cos(th)
        disc = (I3 * w3) ** 2 - 4 * I1p * math.cos(th) * mass * gval * r
        omega = (I3 * w3 - math.sqrt(disc)) / (2 * I1p * math.cos(th))

    q0 = jnp.asarray([math.sin(th / 2), 0.0, 0.0, math.cos(th / 2)],
                     jnp.float64)
    r0 = _rot(np.asarray(q0))
    w_body = r0.T @ (omega * np.array([0, 0, 1.0]) + ws * r0[:, 2])
    quats, _ = _spin(m, q0, jnp.asarray(w_body), steps=20000,
                     gravity=(0.0, 0.0, -gval))

    axes = np.array([_rot(qv)[:, 2] for qv in quats[::100]])
    tilt = np.arccos(np.clip(axes[:, 2], -1, 1))
    # steady precession: tilt constant (no secular nutation growth)
    assert abs(tilt.mean() - th) < 0.01 and tilt.std() < 0.01, (
        tilt.mean(), tilt.std()
    )
    yaw = np.unwrap(np.arctan2(axes[:, 1], axes[:, 0]))
    rate = (yaw[-1] - yaw[0]) / ((len(yaw) - 1) * 100 * DT)
    assert abs(rate - omega) / omega < 0.02, (rate, omega)


def test_spherical_damping_default_matches_reference():
    """Builder default joint_damping must be the reference's 0.995
    (multi_body.hpp:51): each integrate scales spherical qd by
    0.995^(1000*dt), NOT by 0 (the round-3 freeze bug)."""
    b = MultiBodyBuilder(name="pend")
    b.add_link(
        JointType.SPHERICAL, -1, mass=1.0, com=(0, 0, 0.1),
        inertia_about_com=np.diag([0.05, 0.05, 0.02]),
    )
    m = b.finalize()
    assert float(m.joint_damping) == 0.995
    qd0 = jnp.asarray([0.0, 0.0, 10.0], jnp.float64)
    q0 = m.zero_q()
    _, qd1 = integrate_euler(m, q0, qd0, jnp.zeros(3, jnp.float64), 1e-3)
    np.testing.assert_allclose(
        np.asarray(qd1)[2], 10.0 * 0.995, rtol=1e-9
    )


def test_pd_targets_align_after_spherical_joint():
    """COMPACT pose-vector convention: spherical joints consume no
    q_targets slots, so 1-DoF joints AFTER a spherical joint track their
    own targets. Before the fix pd_tau advanced pose_index by 4 (the
    reference's dead convention) and every later joint silently tracked
    the LAST target via JAX's clamped gather."""
    from tds_tpu.control.pd import pd_tau

    b = MultiBodyBuilder(name="mixed")
    b.add_link(JointType.SPHERICAL, -1, mass=1.0, com=(0, 0, 0.1),
               inertia_about_com=np.diag([0.05, 0.05, 0.02]))
    b.add_link(JointType.REVOLUTE_X, 0, mass=1.0, com=(0, 0, 0.1),
               inertia_about_com=np.diag([0.01] * 3))
    b.add_link(JointType.REVOLUTE_Y, 1, mass=1.0, com=(0, 0, 0.1),
               inertia_about_com=np.diag([0.01] * 3))
    m = b.finalize()
    q, qd = m.zero_q(), m.zero_qd()
    targets = jnp.asarray([0.3, -0.2], jnp.float64)
    tau = pd_tau(m, q, qd, targets, kp=10.0, kd=0.0, max_force=100.0)
    # spherical at identity with zero qd -> zero torque; revolute joints
    # pull toward THEIR targets
    np.testing.assert_allclose(np.asarray(tau[:3]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(tau[3]), 10.0 * 0.3, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tau[4]), 10.0 * -0.2, rtol=1e-12)


def test_humanoid_reset_preserves_spherical_quaternions():
    """initial_state must scatter the compact pose vector into 1-DoF q
    slots only; the old contiguous q-slice write clobbered quaternion
    components of spherical joints on the humanoid."""
    import jax as _jax

    from tds_tpu.envs.humanoid import HumanoidEnv

    env = HumanoidEnv(dtype=jnp.float64)
    q, qd = env.initial_state(_jax.random.PRNGKey(0))
    m = env.model
    for i in range(m.num_links):
        if JointType(m.joint_types[i]) == JointType.SPHERICAL:
            qo = m.q_offsets[i]
            quat = np.asarray(q[qo:qo + 4])
            np.testing.assert_allclose(
                quat, [0.0, 0.0, 0.0, 1.0], atol=1e-12,
                err_msg=f"spherical joint {i} quaternion corrupted: {quat}",
            )
