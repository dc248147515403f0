"""Forward kinematics — phase 1 of ABA / CRBA / RNEA.

Computes joint transforms, world poses, link spatial velocities, bias
accelerations and bias forces, and seeds articulated inertias with the
rigid-body inertias. Mirrors the reference pass exactly
(src/dynamics/kinematics.hpp:17-236) with the link loop unrolled at trace
time over the static topology.
"""

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from tds_tpu.algebra import quaternion, spatial
from tds_tpu.algebra import smallmat as sm
from tds_tpu.algebra.inertia import ArticulatedBodyInertia
from tds_tpu.algebra.transform import Transform
from tds_tpu.model.joints import JointType, jcalc_transform, jcalc_velocity
from tds_tpu.model.multibody import MultiBodyModel


class KinLinks(NamedTuple):
    """Per-link kinematics quantities as tuples of per-link values
    (unrolled; stack with jnp.stack if an array view is needed)."""

    x_parent: Tuple[Transform, ...]
    x_world: Tuple[Transform, ...]
    v: Tuple[jnp.ndarray, ...]  # spatial velocity in link frame
    c: Tuple[jnp.ndarray, ...]  # velocity-product acceleration
    pA: Tuple[jnp.ndarray, ...]  # bias force
    abi: Tuple[ArticulatedBodyInertia, ...]
    base_x_world: Transform
    base_velocity: jnp.ndarray  # (…,6)
    base_abi: Optional[ArticulatedBodyInertia]
    base_bias_force: Optional[jnp.ndarray]


def base_pose_from_q(model: MultiBodyModel, q) -> Transform:
    """Floating-base world pose from q[0:7] (kinematics.hpp:41-43)."""
    if model.is_floating:
        rot = quaternion.to_matrix(q[..., 0:4])
        return Transform(pos=q[..., 4:7], rot=rot)
    return model.base_x_world()


def fk_links(
    model: MultiBodyModel,
    q,
    qd,
    f_ext=None,
    base_applied_force=None,
) -> KinLinks:
    """Unrolled forward-kinematics pass (kinematics.hpp:17-148).

    ``f_ext``: optional tuple/array of per-link world-frame force vectors.
    ``base_applied_force``: optional world/base force on the floating base.
    """
    nl = model.num_links
    dtype = q.dtype
    batch = q.shape[:-1]

    base_x_world = base_pose_from_q(model, q)
    if model.is_floating:
        base_velocity = qd[..., 0:6]
        base_abi = ArticulatedBodyInertia.from_rbi(model.base_rbi())
        # gyroscopic bias force on the base (kinematics.hpp:54-61)
        w_world = base_velocity[..., 0:3]
        r = base_x_world.rot
        inertia_world = sm.mmt(sm.mm(r, model.base_inertia), r)
        gyro = jnp.cross(
            w_world, sm.mv(inertia_world, w_world)
        )
        base_bias = spatial.fv(gyro, jnp.zeros_like(gyro))
        if base_applied_force is not None:
            base_bias = base_bias - base_applied_force
    else:
        base_velocity = jnp.zeros(batch + (6,), dtype=dtype)
        base_abi = None
        base_bias = None

    xp_list, xw_list, v_list, c_list, pa_list, abi_list = [], [], [], [], [], []
    for i in range(nl):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        s = model.motion_subspace(i)
        x_parent = jcalc_transform(jt, model.x_t(i), model.joint_axis[i], model.q_for_link(q, i))
        v_j = jcalc_velocity(jt, model.joint_axis[i], s, model.qd_for_link(qd, i))

        if parent >= 0:
            x_world = xw_list[parent].compose(x_parent)
            v_parent = v_list[parent]
            v = x_parent.motion_to_child(v_parent) + v_j
        elif model.is_floating:
            x_world = base_x_world.compose(x_parent)
            v = x_parent.motion_to_child(base_velocity) + v_j
        else:
            x_world = base_x_world.compose(x_parent)
            v = v_j

        c = spatial.cross_mm(v, v_j)  # cJ is zero for all supported joints
        abi = ArticulatedBodyInertia.from_rbi(model.rbi(i))
        p_a = spatial.cross_mf(v, abi.mul_motion(v))
        if f_ext is not None:
            fe = f_ext[i] if isinstance(f_ext, (list, tuple)) else f_ext[..., i, :]
            p_a = p_a - x_world.force_to_child(fe)

        xp_list.append(x_parent)
        xw_list.append(x_world)
        v_list.append(v)
        c_list.append(c)
        pa_list.append(p_a)
        abi_list.append(abi)

    return KinLinks(
        x_parent=tuple(xp_list),
        x_world=tuple(xw_list),
        v=tuple(v_list),
        c=tuple(c_list),
        pA=tuple(pa_list),
        abi=tuple(abi_list),
        base_x_world=base_x_world,
        base_velocity=base_velocity,
        base_abi=base_abi,
        base_bias_force=base_bias,
    )


def forward_kinematics(model: MultiBodyModel, q, qd=None):
    """Public FK: stacked world poses and velocities.

    Returns (x_world: Transform with (nl,…) leaves, v: (nl,…,6)).
    """
    if qd is None:
        qd = jnp.zeros(q.shape[:-1] + (model.dof_qd,), dtype=q.dtype)
    kin = fk_links(model, q, qd)
    x_world = Transform(
        pos=jnp.stack([t.pos for t in kin.x_world], axis=0),
        rot=jnp.stack([t.rot for t in kin.x_world], axis=0),
    )
    v = jnp.stack(kin.v, axis=0)
    return x_world, v


def forward_kinematics_q(model: MultiBodyModel, q):
    """Position-only FK (kinematics.hpp:167-236).

    Returns (base_x_world, links_x_world, links_x_base) with per-link tuples.
    """
    base_x_world = base_pose_from_q(model, q)
    xw, xb = [], []
    for i in range(model.num_links):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        x_parent = jcalc_transform(
            jt, model.x_t(i), model.joint_axis[i], model.q_for_link(q, i)
        )
        if parent >= 0:
            xw.append(xw[parent].compose(x_parent))
            xb.append(xb[parent].compose(x_parent))
        else:
            xw.append(base_x_world.compose(x_parent))
            xb.append(x_parent)
    return base_x_world, tuple(xw), tuple(xb)
