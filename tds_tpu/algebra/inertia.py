"""Rigid-body and articulated-body inertias.

``RigidBodyInertia`` stores (mass m, first moment h = m*com, inertia I about
the body origin) exactly like the reference (src/math/inertia.hpp:8-86 —
note the reference's ``com`` field actually holds the *first moment of mass*
h in most uses; construction from URDF multiplies by mass).

``ArticulatedBodyInertia`` is the 6x6 block matrix
    [ I   H ]
    [ H^T M ]
stored as three 3x3 blocks (reference: inertia.hpp:94-393).

Both are NamedTuples of jnp arrays and broadcast over leading batch dims.
"""

from typing import NamedTuple

import jax.numpy as jnp

from tds_tpu.algebra import spatial
from tds_tpu.algebra import smallmat as sm


class RigidBodyInertia(NamedTuple):
    mass: jnp.ndarray  # (...,)
    h: jnp.ndarray  # (..., 3) first moment of mass m*com
    inertia: jnp.ndarray  # (..., 3, 3) about body-frame origin

    @staticmethod
    def from_mass_com_inertia(mass, com, inertia_about_com):
        """Build from mass, center of mass and inertia about the COM.

        Parallel-axis: I_origin = I_com + m (cx cx^T); h = m*com.
        Matches how the URDF converter feeds the reference
        (src/urdf/urdf_to_multi_body.hpp:52-67).
        """
        mass = jnp.asarray(mass)
        com = jnp.asarray(com)
        cx = spatial.cross_matrix(com)
        i_o = jnp.asarray(inertia_about_com) + mass[..., None, None] * sm.mmt(
            cx, cx
        )
        return RigidBodyInertia(mass=mass, h=mass[..., None] * com, inertia=i_o)

    def __add__(self, other):
        return RigidBodyInertia(
            self.mass + other.mass, self.h + other.h, self.inertia + other.inertia
        )

    def mul_motion(self, m):
        """Spatial momentum f = I v = [I w + h x v, m v - h x w]."""
        w, v = m[..., :3], m[..., 3:]
        n = sm.mv(self.inertia, w) + jnp.cross(self.h, v)
        f = self.mass[..., None] * v - jnp.cross(self.h, w)
        return spatial.fv(n, f)


class ArticulatedBodyInertia(NamedTuple):
    I: jnp.ndarray  # (..., 3, 3)
    H: jnp.ndarray  # (..., 3, 3)
    M: jnp.ndarray  # (..., 3, 3)

    @staticmethod
    def from_rbi(rbi: RigidBodyInertia):
        """Reference: inertia.hpp:114-119 (note rbi.com holds h=m*com there,
        hx is built from com then scaled by mass)."""
        dtype = rbi.inertia.dtype
        hx = spatial.cross_matrix(rbi.h)
        i = rbi.inertia
        m3 = rbi.mass[..., None, None] * jnp.eye(3, dtype=dtype)
        return ArticulatedBodyInertia(I=i, H=hx, M=m3)

    @staticmethod
    def zero(dtype=None, batch_shape=()):
        z = jnp.zeros(batch_shape + (3, 3), dtype=dtype)
        return ArticulatedBodyInertia(z, z, z)

    def __add__(self, other):
        return ArticulatedBodyInertia(
            self.I + other.I, self.H + other.H, self.M + other.M
        )

    def __sub__(self, other):
        return ArticulatedBodyInertia(
            self.I - other.I, self.H - other.H, self.M - other.M
        )

    def matrix(self):
        """Dense (..., 6, 6) form [[I, H], [H^T, M]]."""
        ht = jnp.swapaxes(self.H, -1, -2)
        topr = jnp.concatenate([self.I, self.H], axis=-1)
        botr = jnp.concatenate([ht, self.M], axis=-1)
        return jnp.concatenate([topr, botr], axis=-2)

    def mul_motion(self, v):
        """Ia*v = fv(I w + H v, M v + H^T w) (reference inertia.hpp:205-210)."""
        w, lin = v[..., :3], v[..., 3:]
        n = sm.mv(self.I, w) + sm.mv(self.H, lin)
        f = sm.mv(self.M, lin) + sm.mtv(self.H, w)
        return spatial.fv(n, f)

    def mul_matrix63(self, s):
        """ABI @ S for a (..., 6, 3) motion-subspace matrix -> (..., 6, 3)."""
        st, sb = s[..., :3, :], s[..., 3:, :]
        return jnp.concatenate(
            [
                sm.mm(self.I, st) + sm.mm(self.H, sb),
                sm.mtm(self.H, st) + sm.mm(self.M, sb),
            ],
            axis=-2,
        )

    def inverse(self):
        """Block (Schur-complement) inverse of [[I, H], [H^T, M]].

        Note: the reference's formula (inertia.hpp:302-319) substitutes
        C = -H for the lower-left block, which is only correct while H is
        skew-symmetric (true for rigid-body inertias, false for the
        articulated base inertia accumulated in ABA). The reference's own
        ``rbdl_convention`` branch (forward_dynamics.hpp:228-230) sidesteps
        the bug with a dense 6x6 inverse; we implement the correct Schur
        complement with C = H^T, which matches that branch.
        """
        from tds_tpu.algebra.linalg import inv3

        a_inv = inv3(self.I)
        h = self.H
        s = self.M - sm.mtm(h, sm.mm(a_inv, h))
        s_inv = inv3(s)
        ainv_h_sinv = sm.mm(sm.mm(a_inv, h), s_inv)
        return ArticulatedBodyInertia(
            I=a_inv + sm.mm(ainv_h_sinv, sm.mtm(h, a_inv)),
            H=-ainv_h_sinv,
            M=s_inv,
        )

    def inverse_reference_quirk(self):
        """The reference's block inverse EXACTLY as shipped
        (inertia.hpp:302-319): it sets C = -H where the true lower-left
        block is H^T, which is wrong once H loses skew-symmetry (the
        articulated base inertia). Kept verbatim so floating-base
        trajectories can be replayed bit-compatibly against reference
        goldens; see :meth:`inverse` for the corrected math."""
        from tds_tpu.algebra.linalg import inv3

        a_inv = inv3(self.I)
        h = self.H
        # S = M - C A^-1 B with C = -H  =>  M + H A^-1 H
        s_inv = inv3(self.M + sm.mm(h, sm.mm(a_inv, h)))
        ainv_h_sinv = sm.mm(sm.mm(a_inv, h), s_inv)
        return ArticulatedBodyInertia(
            I=a_inv - sm.mm(ainv_h_sinv, sm.mm(h, a_inv)),
            H=-ainv_h_sinv,
            M=s_inv,
        )

    def inv_mul(self, f):
        """Solve Ia * a = f for a motion vector a."""
        inv = self.inverse()
        n, lin = f[..., :3], f[..., 3:]
        topv = sm.mv(inv.I, n) + sm.mv(inv.H, lin)
        botv = sm.mv(inv.M, lin) + sm.mtv(inv.H, n)
        return spatial.mv(topv, botv)

    @staticmethod
    def outer_ff(a, b):
        """a * b^T for force vectors -> ABI blocks (reference inertia.hpp:333-348)."""
        at, ab = a[..., :3], a[..., 3:]
        bt, bb = b[..., :3], b[..., 3:]
        return ArticulatedBodyInertia(
            I=at[..., :, None] * bt[..., None, :],
            H=at[..., :, None] * bb[..., None, :],
            M=ab[..., :, None] * bb[..., None, :],
        )

    @staticmethod
    def outer_63(a, b):
        """a @ b^T for (..., 6, 3) matrices (reference inertia.hpp:353-369)."""
        at, ab = a[..., :3, :], a[..., 3:, :]
        bt, bb = b[..., :3, :], b[..., 3:, :]
        return ArticulatedBodyInertia(
            I=sm.mmt(at, bt), H=sm.mmt(at, bb), M=sm.mmt(ab, bb)
        )
