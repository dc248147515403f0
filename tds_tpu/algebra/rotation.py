"""Elementary rotation matrices and RPY helpers.

All matrices are active rotations (v_parent = R @ v_child), matching the
reference's TinyMatrix3x3 right-associative convention
(src/math/tiny/tiny_matrix3x3.h:218-339, src/math/matrix_utils.hpp).
"""

import jax.numpy as jnp


def _rot(c, s, axis):
    o = jnp.zeros_like(c)
    i = jnp.ones_like(c)
    if axis == 0:
        rows = [[i, o, o], [o, c, -s], [o, s, c]]
    elif axis == 1:
        rows = [[c, o, s], [o, i, o], [-s, o, c]]
    else:
        rows = [[c, -s, o], [s, c, o], [o, o, i]]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def rotation_x(angle):
    return _rot(jnp.cos(angle), jnp.sin(angle), 0)


def rotation_y(angle):
    return _rot(jnp.cos(angle), jnp.sin(angle), 1)


def rotation_z(angle):
    return _rot(jnp.cos(angle), jnp.sin(angle), 2)


def from_rpy(roll, pitch, yaw):
    """URDF rpy convention: R = Rz(yaw) @ Ry(pitch) @ Rx(roll).

    Reference: tiny_algebra.hpp ``rotation_zyx_matrix`` (used by the URDF
    converter for inertial/visual/collision frames).
    """
    return rotation_z(yaw) @ rotation_y(pitch) @ rotation_x(roll)


def from_axis_angle(axis, angle):
    """Rodrigues formula for rotation about a unit axis."""
    from tds_tpu.algebra.spatial import cross_matrix

    k = cross_matrix(axis)
    i = jnp.eye(3, dtype=k.dtype)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    return i + s * k + (1.0 - c) * (k @ k)
