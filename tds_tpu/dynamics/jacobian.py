"""Point Jacobians: 3 x dof_qd world/base-frame velocity of a point on a link.

Mirrors src/dynamics/jacobian.hpp:12-90 including the floating-base block
(transposed cross matrix of the point on the angular columns, identity on
the linear columns — world-frame base twist convention).
"""

import jax.numpy as jnp

from tds_tpu.algebra import spatial
from tds_tpu.algebra import smallmat as sm
from tds_tpu.algebra.transform import Transform
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyModel


def point_jacobian(
    model: MultiBodyModel,
    q,
    link_index: int,
    point,
    is_local_point: bool = False,
):
    """Jacobian of the world-frame velocity of ``point`` w.r.t. qd.

    ``point`` is in world frame unless ``is_local_point`` (then it is in the
    link frame and the Jacobian is the base-frame variant the constraint
    solver uses, jacobian.hpp:68-75).
    """
    base_x_world, links_x_world, links_x_base = forward_kinematics_q(model, q)
    return point_jacobian_kin(
        model, base_x_world, links_x_world, links_x_base, link_index, point,
        is_local_point=is_local_point, batch=q.shape[:-1], dtype=q.dtype,
    )


def point_jacobian_kin(
    model: MultiBodyModel,
    base_x_world,
    links_x_world,
    links_x_base,
    link_index: int,
    point,
    is_local_point: bool = False,
    batch=(),
    dtype=None,
):
    """Same as :func:`point_jacobian` with precomputed link transforms —
    the contact solver computes FK once and builds many Jacobians.

    Assembly is scatter-free: columns collect into a dict and the (…, 3, n)
    matrix materializes with one stack (per-column ``.at[]`` updates copy
    the whole batched buffer each time)."""
    dtype = dtype or base_x_world.pos.dtype
    n = model.dof_qd
    point = jnp.asarray(point, dtype=dtype)

    cols = {}  # col index -> (…, 3) vector
    if model.is_floating:
        base_point = point if is_local_point else point - base_x_world.pos
        cr = jnp.swapaxes(spatial.cross_matrix(base_point), -1, -2)
        for c in range(3):
            cols[c] = cr[..., :, c]
        eye = jnp.eye(3, dtype=dtype)
        for c in range(3):
            cols[3 + c] = jnp.broadcast_to(eye[:, c], batch + (3,))

    if link_index is not None and link_index >= 0:
        i = link_index
        while True:
            jt = JointType(model.joint_types[i])
            x_frame = links_x_base[i] if is_local_point else links_x_world[i]
            if jt == JointType.SPHERICAL:
                s = model.motion_subspace(i)  # (6,3)
                st = x_frame.motion_matrix_to_parent(s)
                top = st[..., 0:3, :]
                bottom = st[..., 3:6, :] - sm.mm(spatial.cross_matrix(point), top)
                for c in range(3):
                    cols[model.qd_offsets[i] + c] = bottom[..., :, c]
            elif jt != JointType.FIXED:
                s = model.motion_subspace(i)
                st = x_frame.motion_to_parent(s)
                cols[model.qd_offsets[i]] = st[..., 3:6] - jnp.cross(
                    point, st[..., 0:3]
                )
            if model.parents[i] < 0:
                break
            i = model.parents[i]

    zero = jnp.zeros(batch + (3,), dtype=dtype)
    return jnp.stack([cols.get(c, zero) for c in range(n)], axis=-1)


def point_jacobian_fd(
    model: MultiBodyModel, q, link_index: int, start_point, eps: float = 1e-3
):
    """Finite-difference Jacobian for testing: perturb each velocity DoF by
    eps (quaternion DoF via the world-frame angular-velocity increment, the
    same q-dot map the integrator uses) and track the world motion of the
    material point attached to the link (analog of jacobian.hpp:97-165)."""
    from tds_tpu.algebra import quaternion

    base_x_world, links_x_world, _ = forward_kinematics_q(model, q)
    start_point = jnp.asarray(start_point, dtype=q.dtype)
    if link_index >= 0:
        local_point = links_x_world[link_index].apply_inverse_point(start_point)
    else:
        local_point = base_x_world.apply_inverse_point(start_point)
    cols = []
    for i in range(model.dof_qd):
        q_x = q
        if model.is_floating and i < 3:
            base_rot = q[0:4]
            w = jnp.zeros(3, dtype=q.dtype).at[i].set(1.0)
            base_rot = quaternion.integrate_world(base_rot, w, eps)
            q_x = q_x.at[0:4].set(base_rot)
        elif model.is_floating and i < 6:
            q_x = q_x.at[i + 1].add(eps)
        else:
            # spherical joints: integrate the quaternion with a unit local
            # angular velocity on the matching component
            qi = None
            for li in range(model.num_links):
                jt = JointType(model.joint_types[li])
                off = model.qd_offsets[li]
                from tds_tpu.model.joints import qd_width

                if jt != JointType.FIXED and off <= i < off + qd_width(jt):
                    if jt == JointType.SPHERICAL:
                        qo = model.q_offsets[li]
                        w = jnp.zeros(3, dtype=q.dtype).at[i - off].set(1.0)
                        quat_new = quaternion.integrate_local(
                            q[qo : qo + 4], w, eps
                        )
                        q_x = q_x.at[qo : qo + 4].set(quat_new)
                    else:
                        q_x = q_x.at[model.q_offsets[li] + (i - off)].add(eps)
                    break
        bxw, lxw, _ = forward_kinematics_q(model, q_x)
        if link_index >= 0:
            world_point = lxw[link_index].apply_point(local_point)
        else:
            world_point = bxw.apply_point(local_point)
        cols.append((world_point - start_point) / eps)
    return jnp.stack(cols, axis=-1)
