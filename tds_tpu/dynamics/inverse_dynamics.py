"""Recursive Newton-Euler inverse dynamics (RNEA).

tau = ID(model, q, qd, qdd): joint torques that produce accelerations qdd.

The reference's RNEA (src/dynamics/inverse_dynamics.hpp:22-113) omits the
S*qdd term (commented out in kinematics.hpp:142-145) and asserts(false) for
floating bases; this implementation is the full algorithm with the standard
gravity convention (fictitious base acceleration -g), so that

    forward_dynamics(model, q, qd, ID(model, q, qd, qdd), g) == qdd

holds exactly — the property the test-suite checks. Pass ``gravity=0`` and
``qdd=0`` to get pure Coriolis/centrifugal torques, or ``qd=0, qdd=0`` for
gravity compensation (matching the reference's documented recipes with the
sign handled here instead of by the caller).
"""

import jax.numpy as jnp

from tds_tpu.algebra import spatial
from tds_tpu.algebra.inertia import ArticulatedBodyInertia
from tds_tpu.dynamics.kinematics import base_pose_from_q
from tds_tpu.model.joints import JointType, jcalc_transform, jcalc_velocity
from tds_tpu.model.multibody import MultiBodyModel


def inverse_dynamics(
    model: MultiBodyModel,
    q,
    qd,
    qdd,
    gravity,
    f_ext=None,
    return_base_wrench: bool = False,
):
    """Returns tau of shape (…, dof_actuated); optionally also the net base
    wrench (the reaction a floating base would need)."""
    nl = model.num_links
    dtype = q.dtype
    gravity = jnp.asarray(gravity, dtype=dtype)
    a_base = spatial.mv(jnp.zeros_like(gravity), -gravity)

    base_x_world = base_pose_from_q(model, q)
    if model.is_floating:
        v_base = qd[..., 0:6]
        a_base = a_base + qdd[..., 0:6]
    else:
        v_base = jnp.zeros(q.shape[:-1] + (6,), dtype=dtype)

    x_parent, v, a, f = [], [], [], []
    for i in range(nl):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        s = model.motion_subspace(i)
        xp = jcalc_transform(jt, model.x_t(i), model.joint_axis[i], model.q_for_link(q, i))
        v_j = jcalc_velocity(jt, model.joint_axis[i], s, model.qd_for_link(qd, i))
        v_par = v[parent] if parent >= 0 else v_base
        a_par = a[parent] if parent >= 0 else a_base
        vi = xp.motion_to_child(v_par) + v_j
        ci = spatial.cross_mm(vi, v_j)
        qdd_l = model.qd_for_link(qdd, i)
        if jt == JointType.SPHERICAL:
            a_j = jnp.einsum("...ij,...j->...i", s, qdd_l)
        elif jt == JointType.FIXED:
            a_j = jnp.zeros_like(vi)
        else:
            a_j = s * qdd_l[..., 0:1]
        ai = xp.motion_to_child(a_par) + ci + a_j
        abi = ArticulatedBodyInertia.from_rbi(model.rbi(i))
        fi = abi.mul_motion(ai) + spatial.cross_mf(vi, abi.mul_motion(vi))
        x_parent.append(xp)
        v.append(vi)
        a.append(ai)
        f.append(fi)

    if f_ext is not None:
        # second pass for world poses (kept out of the hot path)
        xw = []
        for i in range(nl):
            parent = model.parents[i]
            xw.append(
                (xw[parent] if parent >= 0 else base_x_world).compose(x_parent[i])
            )
            fe = f_ext[i] if isinstance(f_ext, (list, tuple)) else f_ext[..., i, :]
            f[i] = f[i] - xw[i].force_to_child(fe)

    batch = q.shape[:-1]
    tau = jnp.zeros(batch + (model.dof_actuated,), dtype=dtype)
    base_wrench = jnp.zeros(batch + (6,), dtype=dtype)
    for i in reversed(range(nl)):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        s = model.motion_subspace(i)
        if jt == JointType.SPHERICAL:
            val = jnp.einsum("...ji,...j->...i", s, f[i])
            off = model.qd_offsets[i] - (6 if model.is_floating else 0)
            tau = tau.at[..., off : off + 3].set(val)
        elif jt != JointType.FIXED:
            off = model.qd_offsets[i] - (6 if model.is_floating else 0)
            tau = tau.at[..., off].set(spatial.dot(s, f[i]))
        fp = x_parent[i].force_to_parent(f[i])
        if parent >= 0:
            f[parent] = f[parent] + fp
        else:
            base_wrench = base_wrench + fp

    if model.is_floating:
        abi0 = ArticulatedBodyInertia.from_rbi(model.base_rbi())
        base_wrench = (
            base_wrench
            + abi0.mul_motion(a_base)
            + spatial.cross_mf(v_base, abi0.mul_motion(v_base))
        )

    if return_base_wrench:
        return tau, base_wrench
    return tau


def bias_forces(model: MultiBodyModel, q, qd, gravity):
    """C(q, qd) + g(q): torques with qdd = 0 (the reference's de-facto RNEA
    output, inverse_dynamics.hpp:50-71 given kinematics.hpp:142-145)."""
    qdd = jnp.zeros_like(qd)
    return inverse_dynamics(model, q, qd, qdd, gravity)
