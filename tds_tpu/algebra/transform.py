"""Plücker coordinate transforms.

A ``Transform`` X = (pos r, rot R) places a child frame in a parent frame:
R maps child coordinates to parent coordinates (columns are the child axes
expressed in the parent), r is the child origin in the parent frame. This is
the reference's right-associative convention (src/math/transform.hpp:12-204,
TDS_USE_LEFT_ASSOCIATIVE_TRANSFORMS *not* defined).

Directional naming used here (reference name in parens):
- ``apply_point`` / ``apply_inverse_point``: child point -> parent / inverse
- ``motion_to_child``   (Transform::apply(MotionVector), transform.hpp:210)
- ``motion_to_parent``  (Transform::apply_inverse(MotionVector), :232)
- ``force_to_parent``   (Transform::apply(ForceVector), :249)
- ``force_to_child``    (Transform::apply_inverse(ForceVector), :268)
- ``abi_sandwich_transpose``: X^T I^A X, the exact 6x6 sandwich used in ABA
  and CRBA (forward_dynamics.hpp:187-189, mass_matrix.hpp:45)

All ops broadcast over leading batch dims.
"""

from typing import NamedTuple

import jax.numpy as jnp

from tds_tpu.algebra import spatial
from tds_tpu.algebra.smallmat import mm as _mm3, mmt as _mmt3
from tds_tpu.algebra.inertia import ArticulatedBodyInertia, RigidBodyInertia
from tds_tpu.algebra.smallmat import mv as _mv3, mtv as _mtv3


class Transform(NamedTuple):
    pos: jnp.ndarray  # (..., 3)
    rot: jnp.ndarray  # (..., 3, 3), child -> parent

    @staticmethod
    def identity(dtype=None, batch_shape=()):
        return Transform(
            pos=jnp.zeros(batch_shape + (3,), dtype=dtype),
            rot=jnp.broadcast_to(
                jnp.eye(3, dtype=dtype), batch_shape + (3, 3)
            ),
        )

    @staticmethod
    def from_pos(pos):
        pos = jnp.asarray(pos)
        return Transform(pos=pos, rot=jnp.broadcast_to(jnp.eye(3, dtype=pos.dtype), pos.shape + (3,)))

    @staticmethod
    def from_rot(rot):
        rot = jnp.asarray(rot)
        return Transform(pos=jnp.zeros(rot.shape[:-1], dtype=rot.dtype), rot=rot)

    def compose(self, other: "Transform") -> "Transform":
        """X1 * X2: child-of-child placed in this transform's parent frame.

        Reference: transform.hpp:123-131.
        """
        return Transform(
            pos=self.pos + _mv3(self.rot, other.pos),
            rot=_mm3(self.rot, other.rot),
        )

    def __mul__(self, other):
        return self.compose(other)

    def inverse(self) -> "Transform":
        """Reference: transform.hpp:189-204."""
        rt = jnp.swapaxes(self.rot, -1, -2)
        return Transform(pos=_mv3(rt, -self.pos), rot=rt)

    # ---- points ------------------------------------------------------------
    def apply_point(self, p):
        """Child-frame point -> parent frame (transform.hpp:132)."""
        return _mv3(self.rot, p) + self.pos

    def apply_inverse_point(self, p):
        """Parent-frame point -> child frame (transform.hpp:135)."""
        return _mtv3(self.rot, p - self.pos)

    # ---- motion vectors ----------------------------------------------------
    def motion_to_child(self, m):
        """Parent-frame motion vector -> child frame.

        mv(w, v) -> mv(R^T w, R^T (v - r x w)); reference transform.hpp:210-226.
        """
        w, v = m[..., :3], m[..., 3:]
        return spatial.mv(
            _mtv3(self.rot, w), _mtv3(self.rot, v - jnp.cross(self.pos, w))
        )

    def motion_to_parent(self, m):
        """Child-frame motion vector -> parent frame.

        mv(w, v) -> mv(R w, R v + r x (R w)); reference transform.hpp:232-243.
        """
        w, v = m[..., :3], m[..., 3:]
        wt = _mv3(self.rot, w)
        return spatial.mv(wt, _mv3(self.rot, v) + jnp.cross(self.pos, wt))

    # ---- force vectors -----------------------------------------------------
    def force_to_parent(self, f):
        """Child-frame force vector -> parent frame.

        fv(n, f) -> fv(R n + r x (R f), R f); reference transform.hpp:249-262.
        """
        n, lin = f[..., :3], f[..., 3:]
        fb = _mv3(self.rot, lin)
        return spatial.fv(_mv3(self.rot, n) + jnp.cross(self.pos, fb), fb)

    def force_to_child(self, f):
        """Parent-frame force vector -> child frame.

        fv(n, f) -> fv(R^T (n - r x f), R^T f); reference transform.hpp:268-280.
        """
        n, lin = f[..., :3], f[..., 3:]
        return spatial.fv(
            _mtv3(self.rot, n - jnp.cross(self.pos, lin)), _mtv3(self.rot, lin)
        )

    # ---- 6x3 motion-subspace matrices --------------------------------------
    def _per_column(self):
        """Self with an inserted singleton axis so the (…, 3, 6)
        columns-as-rows layout of the matrix helpers broadcasts against a
        BATCHED transform: without it the column axis collides with the
        transform's batch axis (crashed batched spherical CRBA/jacobian)."""
        return Transform(
            pos=self.pos[..., None, :], rot=self.rot[..., None, :, :]
        )

    def motion_matrix_to_child(self, s):
        """Columnwise motion_to_child for (..., 6, 3) matrices
        (reference transform.hpp:314-331)."""
        st = jnp.swapaxes(s, -1, -2)  # (..., 3, 6) columns as rows
        out = self._per_column().motion_to_child(st)
        return jnp.swapaxes(out, -1, -2)

    def motion_matrix_to_parent(self, s):
        """Columnwise motion_to_parent (reference transform.hpp:365-380)."""
        st = jnp.swapaxes(s, -1, -2)
        out = self._per_column().motion_to_parent(st)
        return jnp.swapaxes(out, -1, -2)

    def force_matrix_to_parent(self, s):
        """Columnwise force_to_parent for (..., 6, 3) force matrices
        (reference transform.hpp:291-308)."""
        st = jnp.swapaxes(s, -1, -2)
        out = self._per_column().force_to_parent(st)
        return jnp.swapaxes(out, -1, -2)

    # ---- 6x6 matrices ------------------------------------------------------
    def matrix(self):
        """Motion-transform matrix [[E, 0], [-E rx, E]] with E = R^T
        (reference transform.hpp:72-87)."""
        e = jnp.swapaxes(self.rot, -1, -2)
        rx = spatial.cross_matrix(self.pos)
        zero = jnp.zeros_like(e)
        topr = jnp.concatenate([e, zero], axis=-1)
        botr = jnp.concatenate([-_mm3(e, rx), e], axis=-1)
        return jnp.concatenate([topr, botr], axis=-2)

    # ---- inertias ----------------------------------------------------------
    def rbi_to_parent(self, rbi: RigidBodyInertia) -> RigidBodyInertia:
        """X^T I X: rigid-body inertia of a child expressed in the parent.

        Reference: transform.hpp:409-428 (apply_transpose), with rbi.h the
        first mass moment.
        """
        r = self.pos
        rt = self.rot
        e_t_h = _mv3(rt, rbi.h)  # note: R maps child->parent; "E^T" = R
        h_new = e_t_h + rbi.mass[..., None] * r
        rx = spatial.cross_matrix(r)
        i_new = (
            _mmt3(_mm3(rt, rbi.inertia), rt)
            - _mm3(rx, spatial.cross_matrix(e_t_h))
            - _mm3(spatial.cross_matrix(h_new), rx)
        )
        return RigidBodyInertia(mass=rbi.mass, h=h_new, inertia=i_new)

    def abi_to_parent(self, abi: ArticulatedBodyInertia) -> ArticulatedBodyInertia:
        """X^T I^A X computed blockwise — the exact sandwich used by the
        reference in ABA and CRBA (forward_dynamics.hpp:187-189).

        With X = [[E, 0], [-E rx, E]], E = R^T:
          M' = R M R^T
          H' = R H R^T + rx M'
          I' = R I R^T - (R H R^T) rx + rx (R H^T R^T) - rx M' rx
        """
        r_m = self.rot
        rx = spatial.cross_matrix(self.pos)
        mp = _mmt3(_mm3(r_m, abi.M), r_m)
        hp = _mmt3(_mm3(r_m, abi.H), r_m)
        hpt = _mmt3(_mm3(r_m, jnp.swapaxes(abi.H, -1, -2)), r_m)
        return ArticulatedBodyInertia(
            I=_mmt3(_mm3(r_m, abi.I), r_m) - _mm3(hp, rx) + _mm3(rx, hpt)
            - _mm3(_mm3(rx, mp), rx),
            H=hp + _mm3(rx, mp),
            M=mp,
        )
