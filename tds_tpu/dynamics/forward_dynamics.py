"""Articulated-Body Algorithm (ABA) forward dynamics, O(n).

Pure function: qdd = aba(model, q, qd, tau, gravity, f_ext).
Mirrors the reference exactly (src/dynamics/forward_dynamics.hpp:10-334):
backward sweep computing U, D, u and propagating (Ia, pa) to parents via the
X^T I^A X sandwich, floating-base acceleration from the base ABI block
inverse, then a forward sweep solving per-joint accelerations. The link
loops are unrolled at trace time; joint-type dispatch is static.

Gravity enters as a fictitious base acceleration -g (the standard
Featherstone trick; forward_dynamics.hpp:36-37, :242) and is added back to
the floating-base qdd at the end (:318).
"""

import jax.numpy as jnp

from tds_tpu.algebra import quaternion, spatial
from tds_tpu.algebra.inertia import ArticulatedBodyInertia
from tds_tpu.dynamics.kinematics import fk_links
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyModel


def forward_dynamics(
    model: MultiBodyModel,
    q,
    qd,
    tau,
    gravity,
    f_ext=None,
    base_applied_force=None,
):
    """Compute generalized accelerations qdd of shape (…, dof_qd)."""
    if q.shape[-1] != model.dof_q:
        raise ValueError(f"q has {q.shape[-1]} coords, model needs {model.dof_q}")
    if qd.shape[-1] != model.dof_qd:
        raise ValueError(f"qd has {qd.shape[-1]} coords, model needs {model.dof_qd}")
    if tau is not None and tau.shape[-1] not in (model.dof_actuated, model.dof_qd):
        raise ValueError(
            f"tau has {tau.shape[-1]} entries, model has {model.dof_actuated} actuated DoF"
        )
    kin = fk_links(model, q, qd, f_ext=f_ext, base_applied_force=base_applied_force)
    return forward_dynamics_from_kin(model, kin, q, qd, tau, gravity)


def forward_dynamics_from_kin(model: MultiBodyModel, kin, q, qd, tau, gravity):
    """ABA sweeps over a precomputed forward-kinematics pass (one FK can be
    shared between ABA, CRBA and contact Jacobians within a step)."""
    nl = model.num_links
    dtype = q.dtype
    gravity = jnp.asarray(gravity, dtype=dtype)
    spatial_gravity = spatial.mv(jnp.zeros_like(gravity), gravity)

    p_a = list(kin.pA)
    abi = list(kin.abi)
    base_abi = kin.base_abi
    base_bias = kin.base_bias_force

    # per-link solver temporaries for the forward sweep
    u_terms = [None] * nl  # U (6,) or U_3d (6,3)
    d_inv = [None] * nl  # 1/D or inv(D_3d)
    u_bias = [None] * nl  # u or u_3d

    # ---- backward sweep (forward_dynamics.hpp:50-216) ----------------------
    for i in reversed(range(nl)):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        s = model.motion_subspace(i)

        if jt == JointType.SPHERICAL:
            u3 = abi[i].mul_matrix63(s)  # (…,6,3)
            d3 = jnp.swapaxes(s, -1, -2) @ u3  # (…,3,3); S^T is static
            tau_l = model.tau_for_link(tau, i)
            q_l = model.q_for_link(q, i)
            axis_angle = quaternion.to_axis_angle(q_l)
            tau_l = tau_l - model.stiffness[i] * axis_angle
            tau_l = tau_l - model.damping[i] * model.qd_for_link(qd, i)
            # u = tau - S^T pA ; S top is identity so S^T pA = pA.top
            u3b = tau_l - jnp.einsum("...ji,...j->...i", s, p_a[i])
            from tds_tpu.algebra.linalg import inv3

            invd3 = inv3(d3)
            u_dinv_ut = ArticulatedBodyInertia.outer_63(u3, u3 @ invd3)
            uud = _mat63_vec(u3, jnp.einsum("...ij,...j->...i", invd3, u3b))
            u_terms[i], d_inv[i], u_bias[i] = u3, invd3, u3b
        else:
            u = abi[i].mul_motion(s)
            d = spatial.dot(s, u)
            tau_l = model.tau_for_link(tau, i)[..., 0]
            q_l = model.q_for_link(q, i)[..., 0]
            qd_l = model.qd_for_link(qd, i)[..., 0]
            tau_l = tau_l - model.stiffness[i] * q_l - model.damping[i] * qd_l
            u_b = tau_l - spatial.dot(s, p_a[i])
            if jt == JointType.FIXED:
                invd = jnp.zeros_like(d)
            else:
                invd = 1.0 / d
            u_dinv_ut = ArticulatedBodyInertia.outer_ff(u, u * invd[..., None])
            uud = u * (u_b * invd)[..., None]
            u_terms[i], d_inv[i], u_bias[i] = u, invd, u_b

        ia = abi[i] - u_dinv_ut
        pa = p_a[i] + ia.mul_motion(kin.c[i]) + uud
        delta_pa = kin.x_parent[i].force_to_parent(pa)
        delta_i = kin.x_parent[i].abi_to_parent(ia)
        if parent >= 0:
            p_a[parent] = p_a[parent] + delta_pa
            abi[parent] = abi[parent] + delta_i
        elif model.is_floating:
            base_bias = base_bias + delta_pa
            base_abi = base_abi + delta_i

    # ---- base acceleration (forward_dynamics.hpp:218-243) ------------------
    if model.is_floating:
        base_acc = -base_abi.inv_mul(base_bias)
    else:
        base_acc = -spatial_gravity

    # ---- forward sweep (forward_dynamics.hpp:245-302) ----------------------
    batch = q.shape[:-1]
    qdd = jnp.zeros(batch + (model.dof_qd,), dtype=dtype)
    a = [None] * nl
    for i in range(nl):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        a_parent = a[parent] if parent >= 0 else base_acc
        ai = kin.x_parent[i].motion_to_child(a_parent) + kin.c[i]
        if jt == JointType.SPHERICAL:
            s = model.motion_subspace(i)
            ut_a = jnp.einsum("...ji,...j->...i", u_terms[i], ai)
            qdd_val = jnp.einsum(
                "...ij,...j->...i", d_inv[i], u_bias[i] - ut_a
            )
            off = model.qd_offsets[i]
            qdd = qdd.at[..., off : off + 3].set(qdd_val)
            ai = ai + _mat63_vec(s, qdd_val)
        elif jt != JointType.FIXED:
            s = model.motion_subspace(i)
            ut_a = spatial.dot(u_terms[i], ai)
            qdd_val = d_inv[i] * (u_bias[i] - ut_a)
            qdd = qdd.at[..., model.qd_offsets[i]].set(qdd_val)
            ai = ai + s * qdd_val[..., None]
        a[i] = ai

    if model.is_floating:
        qdd = qdd.at[..., 0:6].set(base_acc + spatial_gravity)
    return qdd


def _mat63_vec(m, v):
    """(…,6,3) @ (…,3) -> (…,6) spatial vector."""
    return jnp.einsum("...ij,...j->...i", m, v)
