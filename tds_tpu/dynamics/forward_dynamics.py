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

The backward sweep is split into a velocity-independent *articulated factor*
(:class:`AbaFactor`: per-link U, D^-1, updated ABIs, inverted base ABI) and a
bias sweep. The factor doubles as an O(n) factorization of the joint-space
mass matrix: :func:`minv_mul` applies M(q)^-1 to arbitrary generalized-force
vectors (multi-RHS) by running the zero-bias ABA sweeps — this replaces the
reference contact solver's dense CRBA + matrix inverse
(src/mb_constraint_solver.hpp:210-262) with Featherstone's
operational-space-inertia propagation.
"""

from contextlib import contextmanager
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from tds_tpu.algebra import quaternion, smallmat as sm, spatial
from tds_tpu.algebra.inertia import ArticulatedBodyInertia
from tds_tpu.dynamics.kinematics import fk_links
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyModel
from tds_tpu.algebra.update import set_index, set_slice


# Trace-time switch: when True, the floating-base ABI is inverted with the
# reference's shipped (incorrect, C=-H) block formula instead of the proper
# Schur complement — for bit-compatible replay of reference floating-base
# trajectories (inertia.hpp:302-319; the reference's own rbdl_convention
# branch avoids the bug). Use via reference_base_abi_quirk().
_BASE_ABI_QUIRK = False


@contextmanager
def reference_base_abi_quirk():
    """Within this context, newly traced floating-base dynamics reproduce
    the reference's default forward_dynamics (buggy base-ABI inverse)."""
    global _BASE_ABI_QUIRK
    prev = _BASE_ABI_QUIRK
    _BASE_ABI_QUIRK = True
    try:
        yield
    finally:
        _BASE_ABI_QUIRK = prev


class AbaFactor(NamedTuple):
    """Velocity-independent ABA byproducts (an implicit factorization of M).

    Per-link tuples indexed like ``model`` links:
    - ``u``: U = I^A S, shape (…, 6) or (…, 6, 3) for spherical joints
    - ``d_inv``: 1/D scalar, or inv(S^T U) (…, 3, 3) for spherical
    - ``ia``: post-update articulated inertia I^a = I^A - U D^-1 U^T
    - ``base_abi``: accumulated base ABI (floating models), else None
    - ``base_abi_inv``: its explicit block inverse, else None
    """

    u: Tuple
    d_inv: Tuple
    ia: Tuple
    base_abi: Optional[ArticulatedBodyInertia]
    base_abi_inv: Optional[ArticulatedBodyInertia]
    # inverse used by the ABA base solve specifically. Normally the same
    # object as base_abi_inv; under reference_base_abi_quirk() it is the
    # reference's shipped (buggy) block inverse, while base_abi_inv stays
    # correct — matching the reference, whose constraint solver inverts the
    # (correct) CRBA mass matrix even though its ABA base solve is buggy.
    base_abi_inv_aba: Optional[ArticulatedBodyInertia] = None


def aba_factor(model: MultiBodyModel, kin) -> AbaFactor:
    """Backward ABI sweep (forward_dynamics.hpp:50-216, inertia terms only).

    Depends on q (through ``kin`` transforms) but not on velocities, forces
    or torques, so one factor per step serves ABA, the contact solver's
    M^-1 J^T, and delassus assembly.
    """
    nl = model.num_links
    abi = list(kin.abi)
    base_abi = kin.base_abi
    u_terms = [None] * nl
    d_inv = [None] * nl
    ia_list = [None] * nl

    for i in reversed(range(nl)):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        s = model.motion_subspace(i)

        if jt == JointType.SPHERICAL:
            u3 = abi[i].mul_matrix63(s)  # (…,6,3)
            d3 = sm.mtm(s, u3)  # (…,3,3); S^T is static
            from tds_tpu.algebra.linalg import inv3

            invd3 = inv3(d3)
            u_dinv_ut = ArticulatedBodyInertia.outer_63(u3, u3 @ invd3)
            u_terms[i], d_inv[i] = u3, invd3
        elif jt == JointType.FIXED:
            u = abi[i].mul_motion(s)
            invd = jnp.zeros_like(spatial.dot(s, u))
            u_dinv_ut = ArticulatedBodyInertia.outer_ff(u, u * invd[..., None])
            u_terms[i], d_inv[i] = u, invd
        else:
            u = abi[i].mul_motion(s)
            invd = 1.0 / spatial.dot(s, u)
            u_dinv_ut = ArticulatedBodyInertia.outer_ff(u, u * invd[..., None])
            u_terms[i], d_inv[i] = u, invd

        ia = abi[i] - u_dinv_ut
        ia_list[i] = ia
        delta_i = kin.x_parent[i].abi_to_parent(ia)
        if parent >= 0:
            abi[parent] = abi[parent] + delta_i
        elif model.is_floating:
            base_abi = base_abi + delta_i

    if model.is_floating:
        base_abi_inv = base_abi.inverse()
        base_abi_inv_aba = (
            base_abi.inverse_reference_quirk() if _BASE_ABI_QUIRK else base_abi_inv
        )
    else:
        base_abi_inv = base_abi_inv_aba = None
    return AbaFactor(
        u=tuple(u_terms),
        d_inv=tuple(d_inv),
        ia=tuple(ia_list),
        base_abi=base_abi,
        base_abi_inv=base_abi_inv,
        base_abi_inv_aba=base_abi_inv_aba,
    )


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
    if tau is not None and tau.shape[-1] != model.dof_actuated:
        # tau is ACTUATED-layout only (reference multi_body.hpp:560-573).
        # A dof_qd-length vector on a floating base used to pass validation
        # but tau_for_link read it shifted by the 6 base slots — silently
        # wrong torques. Base wrenches go through base_applied_force/f_ext.
        raise ValueError(
            f"tau has {tau.shape[-1]} entries, model has {model.dof_actuated}"
            " actuated DoF (base wrench belongs in base_applied_force, not"
            " tau)"
        )
    kin = fk_links(model, q, qd, f_ext=f_ext, base_applied_force=base_applied_force)
    return forward_dynamics_from_kin(model, kin, q, qd, tau, gravity)


def forward_dynamics_from_kin(
    model: MultiBodyModel, kin, q, qd, tau, gravity, factor: Optional[AbaFactor] = None
):
    """ABA sweeps over a precomputed forward-kinematics pass (one FK and one
    :func:`aba_factor` can be shared between ABA and the contact solver
    within a step)."""
    nl = model.num_links
    dtype = q.dtype
    gravity = jnp.asarray(gravity, dtype=dtype)
    spatial_gravity = spatial.mv(jnp.zeros_like(gravity), gravity)

    if factor is None:
        factor = aba_factor(model, kin)

    p_a = list(kin.pA)
    base_bias = kin.base_bias_force

    u_bias = [None] * nl  # u or u_3d

    # ---- backward bias sweep (forward_dynamics.hpp:50-216) -----------------
    for i in reversed(range(nl)):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        s = model.motion_subspace(i)

        if jt == JointType.SPHERICAL:
            tau_l = model.tau_for_link(tau, i)
            q_l = model.q_for_link(q, i)
            axis_angle = quaternion.to_axis_angle(q_l)
            tau_l = tau_l - model.stiffness[i] * axis_angle
            tau_l = tau_l - model.damping[i] * model.qd_for_link(qd, i)
            # u = tau - S^T pA ; S top is identity so S^T pA = pA.top
            u3b = tau_l - sm.mtv(s, p_a[i])
            uud = _mat63_vec(factor.u[i], sm.mv(factor.d_inv[i], u3b))
            u_bias[i] = u3b
        else:
            tau_l = model.tau_for_link(tau, i)[..., 0]
            q_l = model.q_for_link(q, i)[..., 0]
            qd_l = model.qd_for_link(qd, i)[..., 0]
            tau_l = tau_l - model.stiffness[i] * q_l - model.damping[i] * qd_l
            u_b = tau_l - spatial.dot(s, p_a[i])
            uud = factor.u[i] * (u_b * factor.d_inv[i])[..., None]
            u_bias[i] = u_b

        pa = p_a[i] + factor.ia[i].mul_motion(kin.c[i]) + uud
        delta_pa = kin.x_parent[i].force_to_parent(pa)
        if parent >= 0:
            p_a[parent] = p_a[parent] + delta_pa
        elif model.is_floating:
            base_bias = base_bias + delta_pa

    # ---- base acceleration (forward_dynamics.hpp:218-243) ------------------
    if model.is_floating:
        inv = (
            factor.base_abi_inv_aba
            if factor.base_abi_inv_aba is not None
            else factor.base_abi_inv
        )
        base_acc = -_abi_apply(inv, base_bias)
    else:
        # broadcast to the batch so root links can mix it with batched
        # transforms (supports whole-batch stepping without vmap)
        base_acc = jnp.broadcast_to(-spatial_gravity, q.shape[:-1] + (6,))

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
            ut_a = sm.mtv(factor.u[i], ai)
            qdd_val = sm.mv(factor.d_inv[i], u_bias[i] - ut_a)
            off = model.qd_offsets[i]
            qdd = set_slice(qdd, off, qdd_val)
            ai = ai + _mat63_vec(s, qdd_val)
        elif jt != JointType.FIXED:
            s = model.motion_subspace(i)
            ut_a = spatial.dot(factor.u[i], ai)
            qdd_val = factor.d_inv[i] * (u_bias[i] - ut_a)
            qdd = set_index(qdd, model.qd_offsets[i], qdd_val)
            ai = ai + s * qdd_val[..., None]
        a[i] = ai

    if model.is_floating:
        qdd = set_slice(qdd, 0, base_acc + spatial_gravity)
    return qdd


def minv_mul(model: MultiBodyModel, kin, factor: AbaFactor, x):
    """Apply the inverse joint-space mass matrix: returns M(q)^-1 x, O(n).

    ``x`` has shape (*extra, *batch, dof_qd) where ``batch`` is the batch
    shape of the model state used to build ``kin``/``factor`` — extra
    leading axes (e.g. a multi-RHS axis) broadcast for free. Runs the ABA
    sweeps with zero velocities/bias and generalized force x (Featherstone's
    identity qdd = M^-1 tau at qd = 0, no gravity). Replaces dense
    CRBA+inverse of the reference contact solver
    (src/mb_constraint_solver.hpp:210-262); agreement with the explicit
    factorization is validated in tests/test_minv.py.
    """
    nl = model.num_links
    batch = x.shape[:-1]
    dtype = x.dtype
    zero6 = jnp.zeros(batch + (6,), dtype=dtype)

    p_a = [zero6] * nl
    base_p = None
    u_bias = [None] * nl

    # backward sweep: propagate test forces, zero bias
    for i in reversed(range(nl)):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        s = model.motion_subspace(i)
        off = model.qd_offsets[i]

        if jt == JointType.SPHERICAL:
            x_l = x[..., off : off + 3]
            u3b = x_l - sm.mtv(s, p_a[i])
            uud = _mat63_vec(factor.u[i], sm.mv(factor.d_inv[i], u3b))
            u_bias[i] = u3b
        elif jt == JointType.FIXED:
            uud = 0.0
        else:
            x_l = x[..., off]
            u_b = x_l - spatial.dot(s, p_a[i])
            uud = factor.u[i] * (u_b * factor.d_inv[i])[..., None]
            u_bias[i] = u_b

        pa = p_a[i] + uud
        delta_pa = kin.x_parent[i].force_to_parent(pa)
        if parent >= 0:
            p_a[parent] = p_a[parent] + delta_pa
        else:
            base_p = delta_pa if base_p is None else base_p + delta_pa

    out = jnp.zeros_like(x)
    if model.is_floating:
        f0 = x[..., 0:6]
        if base_p is not None:
            f0 = f0 - base_p
        base_acc = _abi_apply(factor.base_abi_inv, f0)
        out = set_slice(out, 0, base_acc)
    else:
        base_acc = zero6

    # forward sweep
    a = [None] * nl
    for i in range(nl):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        a_parent = a[parent] if parent >= 0 else base_acc
        ai = kin.x_parent[i].motion_to_child(a_parent)
        if jt == JointType.SPHERICAL:
            s = model.motion_subspace(i)
            ut_a = sm.mtv(factor.u[i], ai)
            qdd_val = sm.mv(factor.d_inv[i], u_bias[i] - ut_a)
            off = model.qd_offsets[i]
            out = set_slice(out, off, qdd_val)
            ai = ai + _mat63_vec(s, qdd_val)
        elif jt != JointType.FIXED:
            s = model.motion_subspace(i)
            ut_a = spatial.dot(factor.u[i], ai)
            qdd_val = factor.d_inv[i] * (u_bias[i] - ut_a)
            out = set_index(out, model.qd_offsets[i], qdd_val)
            ai = ai + s * qdd_val[..., None]
        a[i] = ai
    return out


def _abi_apply(abi: ArticulatedBodyInertia, f):
    """[[I, H], [H^T, M]] @ [n; f] for precomputed (inverse) ABI blocks."""
    n, lin = f[..., :3], f[..., 3:]
    topv = sm.mv(abi.I, n) + sm.mv(abi.H, lin)
    botv = sm.mv(abi.M, lin) + sm.mtv(abi.H, n)
    return spatial.mv(topv, botv)


def _mat63_vec(m, v):
    """(…,6,3) @ (…,3) -> (…,6) spatial vector."""
    return sm.mv(m, v)
