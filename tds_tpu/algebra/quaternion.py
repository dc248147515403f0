"""Quaternion operations (xyzw storage), batch-friendly over leading dims.

Conventions match the reference engine (tiny-differentiable-simulator):
- storage order is ``[x, y, z, w]`` (reference: src/math/tiny/tiny_quaternion.h)
- ``to_matrix`` produces the active rotation matrix R with
  ``v_world = R @ v_local`` (reference: tiny_matrix3x3.h:315 ``setRotation``)
- ``velocity_world`` is the world-frame angular-velocity quaternion derivative
  used for floating-base integration
  (reference: src/math/tiny/tiny_algebra.hpp:604 ``quat_velocity``)
- ``velocity_local`` is the local (body-frame) variant used for spherical
  joints (reference: tiny_algebra.hpp:616 ``quat_velocity_spherical``)

All functions broadcast over arbitrary leading batch dimensions.
"""

import jax.numpy as jnp


def identity(dtype=jnp.float64):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def from_xyzw(x, y, z, w):
    return jnp.stack([x, y, z, w], axis=-1)


def split(q):
    """Return (vec, w) parts of an xyzw quaternion."""
    return q[..., :3], q[..., 3]


def mul(a, b):
    """Hamilton product a ⊗ b (both xyzw)."""
    av, aw = a[..., :3], a[..., 3:4]
    bv, bw = b[..., :3], b[..., 3:4]
    vec = aw * bv + bw * av + jnp.cross(av, bv)
    w = aw * bw - jnp.sum(av * bv, axis=-1, keepdims=True)
    return jnp.concatenate([vec, w], axis=-1)


def conjugate(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotate(q, v):
    """Rotate vector v by quaternion q (active, local -> world)."""
    qv, qw = q[..., :3], q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def to_matrix(q):
    """Active rotation matrix (…,3,3) such that R @ v_local = v_world.

    Uses the 2/|q|^2 normalization so unnormalized quaternions map to the
    same rotation (reference: tiny_matrix3x3.h:316-339).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    d = x * x + y * y + z * z + w * w
    s = 2.0 / d
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    one = jnp.ones_like(d)
    r = jnp.stack(
        [
            jnp.stack([one - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, one - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, one - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return r


def from_matrix(m):
    """Rotation matrix -> xyzw quaternion (Shepperd's branchless method).

    Differentiable away from the branch boundaries; uses jnp.where-selected
    candidates so it is traceable (no Python branching on values).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate quaternions, each numerically stable in one regime;
    # the pivot slot holds t itself so t/(2*sqrt(t)) = sqrt(t)/2
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-30))

    t_w = 1.0 + tr
    t_x = 1.0 + m00 - m11 - m22
    t_y = 1.0 - m00 + m11 - m22
    t_z = 1.0 - m00 - m11 + m22
    qw = jnp.stack([t_w, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, t_x, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, t_y, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, t_z], axis=-1)
    qw = qw / (2.0 * safe_sqrt(t_w))[..., None]
    qx = qx / (2.0 * safe_sqrt(t_x))[..., None]
    qy = qy / (2.0 * safe_sqrt(t_y))[..., None]
    qz = qz / (2.0 * safe_sqrt(t_z))[..., None]

    # pick the candidate with largest pivot
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4cand,4comp[wxyz])
    sel = jnp.take_along_axis(cand, best[..., None, None], axis=-2)[..., 0, :]
    # reorder wxyz -> xyzw
    return jnp.stack([sel[..., 1], sel[..., 2], sel[..., 3], sel[..., 0]], axis=-1)


def from_axis_angle(axis, angle):
    """Quaternion for rotation of `angle` about unit `axis`."""
    half = 0.5 * angle
    s = jnp.sin(half)
    vec = axis * s[..., None]
    return jnp.concatenate([vec, jnp.cos(half)[..., None]], axis=-1)


def to_axis_angle(q):
    """Rotation vector theta*axis from quaternion.

    Matches reference tiny_algebra.hpp:509 ``quaternion_axis_angle``:
    theta = 2*atan2(|qv|, qw); returns (theta/|qv|) * qv with a Taylor
    fallback near |qv|=0.
    """
    from tds_tpu.algebra.spatial import safe_norm

    qv, qw = q[..., :3], q[..., 3]
    n = safe_norm(qv, axis=-1)  # plain norm backprops NaN at qv = 0
    theta = 2.0 * jnp.arctan2(n, qw)
    # (theta/n) qv, safe at n->0 where theta/n -> 2/qw
    scale = jnp.where(n > 1e-12, theta / jnp.where(n > 1e-12, n, 1.0), 2.0 / qw)
    return qv * scale[..., None]


def velocity_world(q, omega_world, dt):
    """Quaternion increment 0.5*dt*(omega_world ⊗ q).

    Reference: tiny_algebra.hpp:604-614 ``quat_velocity`` (floating base).
    """
    w = jnp.concatenate([omega_world, jnp.zeros_like(omega_world[..., :1])], axis=-1)
    return mul(w, q) * (0.5 * dt)


def velocity_local(q, omega_local, dt):
    """Quaternion increment 0.5*dt*(q ⊗ omega_local).

    Reference: tiny_algebra.hpp:616-627 ``quat_velocity_spherical``.
    """
    w = jnp.concatenate([omega_local, jnp.zeros_like(omega_local[..., :1])], axis=-1)
    return mul(q, w) * (0.5 * dt)


def integrate_world(q, omega_world, dt):
    """q + 0.5*dt*(omega ⊗ q), renormalized (reference integrator.hpp:47,80)."""
    return normalize(q + velocity_world(q, omega_world, dt))


def integrate_local(q, omega_local, dt):
    """q + 0.5*dt*(q ⊗ omega), renormalized (spherical joints)."""
    return normalize(q + velocity_local(q, omega_local, dt))
