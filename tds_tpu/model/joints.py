"""Joint types and trace-time joint calculations (jcalc).

Joint-type dispatch happens at Python trace time (the joint type of every
link is static model topology), mirroring how the reference's templated
``Link::jcalc`` switch (src/link.hpp:229-336) is resolved at compile time.
The emitted XLA program therefore contains no joint-type branching.

Joint types and their q/qd widths (reference: src/link.hpp:9-21,
src/multi_body.hpp:612-663):

===================  ==  ===
type                 nq  nqd
===================  ==  ===
FIXED                0   0
PRISMATIC_{X,Y,Z}    1   1
PRISMATIC_AXIS       1   1
REVOLUTE_{X,Y,Z}     1   1
REVOLUTE_AXIS        1   1
SPHERICAL            4   3   (xyzw quaternion / body-frame angular velocity)
===================  ==  ===
"""

import enum

import jax.numpy as jnp

from tds_tpu.algebra import smallmat as sm

from tds_tpu.algebra import quaternion, rotation, spatial
from tds_tpu.algebra.transform import Transform


class JointType(enum.IntEnum):
    # values mirror the reference enum (link.hpp:9-21) for serialization parity
    FIXED = -1
    PRISMATIC_X = 0
    PRISMATIC_Y = 1
    PRISMATIC_Z = 2
    PRISMATIC_AXIS = 3
    REVOLUTE_X = 4
    REVOLUTE_Y = 5
    REVOLUTE_Z = 6
    REVOLUTE_AXIS = 7
    SPHERICAL = 8


PRISMATIC_TYPES = (
    JointType.PRISMATIC_X,
    JointType.PRISMATIC_Y,
    JointType.PRISMATIC_Z,
    JointType.PRISMATIC_AXIS,
)
REVOLUTE_TYPES = (
    JointType.REVOLUTE_X,
    JointType.REVOLUTE_Y,
    JointType.REVOLUTE_Z,
    JointType.REVOLUTE_AXIS,
)

_AXIS_OF = {
    JointType.PRISMATIC_X: 0,
    JointType.PRISMATIC_Y: 1,
    JointType.PRISMATIC_Z: 2,
    JointType.REVOLUTE_X: 0,
    JointType.REVOLUTE_Y: 1,
    JointType.REVOLUTE_Z: 2,
}

_ROTFN = {0: rotation.rotation_x, 1: rotation.rotation_y, 2: rotation.rotation_z}


def q_width(joint_type: JointType) -> int:
    if joint_type == JointType.FIXED:
        return 0
    if joint_type == JointType.SPHERICAL:
        return 4
    return 1


def qd_width(joint_type: JointType) -> int:
    if joint_type == JointType.FIXED:
        return 0
    if joint_type == JointType.SPHERICAL:
        return 3
    return 1


def motion_subspace(joint_type: JointType, axis, dtype):
    """Joint motion subspace S.

    Returns a (6,) spatial vector for 1-DoF joints, a (6, 3) matrix for
    spherical joints, and a (6,) zero vector for fixed joints.
    Reference: link.hpp:125-193 ``set_joint_type``.
    """
    z3 = jnp.zeros(3, dtype=dtype)
    if joint_type == JointType.FIXED:
        return jnp.zeros(6, dtype=dtype)
    if joint_type == JointType.SPHERICAL:
        top = jnp.eye(3, dtype=dtype)
        return jnp.concatenate([top, jnp.zeros((3, 3), dtype=dtype)], axis=0)
    if joint_type in (JointType.PRISMATIC_AXIS,):
        return spatial.mv(z3, jnp.asarray(axis, dtype=dtype))
    if joint_type in (JointType.REVOLUTE_AXIS,):
        return spatial.mv(jnp.asarray(axis, dtype=dtype), z3)
    unit = jnp.asarray(
        [1.0 if k == _AXIS_OF[joint_type] else 0.0 for k in range(3)],
        dtype=dtype,
    )
    if joint_type in PRISMATIC_TYPES:
        return spatial.mv(z3, unit)
    return spatial.mv(unit, z3)


def jcalc_transform(joint_type: JointType, x_t: Transform, axis, q_link):
    """X_parent = X_T * X_J(q) for a single link (link.hpp:229-287).

    ``q_link`` has shape (..., q_width); ``axis`` is the static joint axis
    array for *_AXIS joints (ignored otherwise).
    """
    if joint_type == JointType.FIXED:
        return x_t
    dtype = x_t.pos.dtype
    if joint_type in PRISMATIC_TYPES:
        if joint_type == JointType.PRISMATIC_AXIS:
            d = jnp.asarray(axis, dtype=dtype) * q_link[..., 0:1]
        else:
            i = _AXIS_OF[joint_type]
            one_hot = jnp.asarray(
                [1.0 if k == i else 0.0 for k in range(3)], dtype=dtype
            )
            d = one_hot * q_link[..., 0:1]
        # X_T * translation-only X_J
        return Transform(pos=x_t.pos + sm.mv(x_t.rot, d), rot=x_t.rot)
    if joint_type in (JointType.REVOLUTE_X, JointType.REVOLUTE_Y, JointType.REVOLUTE_Z):
        r = _ROTFN[_AXIS_OF[joint_type]](q_link[..., 0])
    elif joint_type == JointType.REVOLUTE_AXIS:
        # the joint ROTATION normalizes the axis (TinyQuaternion::setRotation
        # divides by |axis|, tiny_quaternion.h:178-183) while the motion
        # subspace S keeps the raw axis — reference behavior for URDFs with
        # approximate axes like 0.7071067
        ax = jnp.asarray(axis, dtype=dtype)
        ax = ax / jnp.linalg.norm(ax)
        quat = quaternion.from_axis_angle(ax, q_link[..., 0])
        r = quaternion.to_matrix(quat)
    elif joint_type == JointType.SPHERICAL:
        r = quaternion.to_matrix(q_link)
    else:
        raise ValueError(f"unknown joint type {joint_type}")
    return Transform(pos=x_t.pos, rot=sm.mm(x_t.rot, r))


def jcalc_velocity(joint_type: JointType, axis, s, qd_link):
    """Local joint velocity vJ (link.hpp:289-329).

    ``s`` is the motion subspace from :func:`motion_subspace`.
    """
    if joint_type == JointType.FIXED:
        return jnp.zeros(qd_link.shape[:-1] + (6,), dtype=qd_link.dtype)
    if joint_type == JointType.SPHERICAL:
        return jnp.concatenate(
            [qd_link, jnp.zeros_like(qd_link)], axis=-1
        )
    return s * qd_link[..., 0:1]
