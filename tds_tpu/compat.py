"""pytinydiffsim-flavored compatibility shim.

The reference ships pybind11 modules (pytinydiffsim / _ad / _dual,
python/pytinydiffsim.inl) with a mutable, object-oriented API. This module
offers the most-used names on top of the functional core so reference
user scripts port mechanically; it is a convenience veneer — new code
should use the functional API directly (and gets jit/vmap/grad for free;
the _ad/_dual scalar-variant modules are unnecessary here because every
function is differentiable).

Covered surface (pytinydiffsim.inl:657-815 and the module tour in
python/examples): Vector3/Quaternion helpers, TinyMultiBody with q/qd/tau
properties and forward_dynamics/integrate helpers, TinyWorld with
step(), UrdfParser-style loaders, and the free functions
forward_dynamics / integrate_euler / mass_matrix / point_jacobian /
inverse_dynamics / inverse_kinematics.
"""

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from tds_tpu.algebra import quaternion as _quat
from tds_tpu.dynamics import forward_dynamics as _fd
from tds_tpu.dynamics import integrate_euler as _ie
from tds_tpu.dynamics.inverse_dynamics import inverse_dynamics as _id
from tds_tpu.dynamics.jacobian import point_jacobian as _pj
from tds_tpu.dynamics.mass_matrix import mass_matrix as _mm
from tds_tpu.control.ik import IKMethod, IKTarget, inverse_kinematics
from tds_tpu.model.multibody import MultiBodyModel
from tds_tpu.urdf.cache import construct, construct_from_string
from tds_tpu.world import (
    ContactSolverParams,
    World,
    build_world,
    make_ground_plane,
    resolve_contacts,
)


# ---- small math helpers (TinyVector3 / TinyQuaternion) --------------------
def Vector3(x=0.0, y=0.0, z=0.0):
    return jnp.asarray([x, y, z])


def Quaternion(x=0.0, y=0.0, z=0.0, w=1.0):
    return jnp.asarray([x, y, z, w])


quat_to_matrix = _quat.to_matrix
matrix_to_quat = _quat.from_matrix
quat_from_xyzw = Quaternion


def get_axis_difference_quaternion(q_desired, q_actual):
    """Orientation error rotation vector (matrix_utils.hpp:77-89 analog)."""
    from tds_tpu.control.pd import spherical_pd_error

    return spherical_pd_error(q_desired, q_actual)


class TinyMultiBody:
    """Mutable wrapper pairing a static model with a (q, qd, tau) state."""

    def __init__(self, model: MultiBodyModel, geoms=()):
        self.model = model
        self.geoms = tuple(geoms)
        self.q = model.zero_q()
        self.qd = model.zero_qd()
        self.qdd = model.zero_qd()
        self.tau = jnp.zeros(model.dof_actuated, self.q.dtype)

    # naming parity with the bindings
    def dof(self):
        return self.model.dof_q

    def dof_qd(self):
        return self.model.dof_qd

    def dof_actuated(self):
        return self.model.dof_actuated

    def set_q(self, q):
        self.q = jnp.asarray(q)

    def set_qd(self, qd):
        self.qd = jnp.asarray(qd)

    def set_tau(self, tau):
        self.tau = jnp.asarray(tau)

    def forward_dynamics(self, gravity):
        self.qdd = _fd(self.model, self.q, self.qd, self.tau, jnp.asarray(gravity))
        return self.qdd

    def integrate(self, dt):
        self.q, self.qd = _ie(self.model, self.q, self.qd, self.qdd, dt)

    def mass_matrix(self):
        return _mm(self.model, self.q)

    def point_jacobian(self, link_index, point, is_local=False):
        return _pj(self.model, self.q, link_index, jnp.asarray(point), is_local)


class TinyWorld:
    """Owns multibodies + ground plane and steps contacts
    (world.hpp:29-368 veneer)."""

    def __init__(self):
        self.gravity = jnp.asarray([0.0, 0.0, -9.81])
        self.bodies: List[TinyMultiBody] = []
        self._world: Optional[World] = None
        plane_model, plane_geoms = make_ground_plane()
        self._plane = (plane_model, plane_geoms)
        self.friction = 0.5
        self.restitution = 0.0
        self.num_solver_iterations = 1

    def set_gravity(self, g):
        self.gravity = jnp.asarray(g)

    def create_multi_body(self, model: MultiBodyModel, geoms=()):
        mb = TinyMultiBody(model, geoms)
        self.bodies.append(mb)
        self._world = None
        return mb

    def _build(self):
        if self._world is None:
            entries = [self._plane] + [(mb.model, mb.geoms) for mb in self.bodies]
            self._world = build_world(
                entries,
                solver=ContactSolverParams(
                    pgs_iterations=self.num_solver_iterations,
                    friction=self.friction,
                    restitution=self.restitution,
                ),
            )
        return self._world

    def step(self, dt):
        """Contact-impulse pass on all bodies' velocities (like the
        reference, multibody integration stays with the caller)."""
        world = self._build()
        zero = jnp.zeros(0)
        qs = (zero,) + tuple(mb.q for mb in self.bodies)
        qds = (zero,) + tuple(mb.qd for mb in self.bodies)
        new_qds = resolve_contacts(world, qs, qds, dt)
        for mb, qd in zip(self.bodies, new_qds[1:]):
            mb.qd = qd


class UrdfParser:
    @staticmethod
    def load_urdf(path, is_floating=False):
        model, geoms = construct(path, is_floating=is_floating)
        return TinyMultiBody(model, geoms)

    @staticmethod
    def load_urdf_from_string(text, is_floating=False):
        model, geoms = construct_from_string(text, is_floating=is_floating)
        return TinyMultiBody(model, geoms)


# free functions mirroring pytinydiffsim.inl:657-686
def forward_dynamics(mb: TinyMultiBody, gravity):
    return mb.forward_dynamics(gravity)


def integrate_euler(mb: TinyMultiBody, dt):
    mb.integrate(dt)


def mass_matrix(mb: TinyMultiBody):
    return mb.mass_matrix()


def point_jacobian(mb: TinyMultiBody, link_index, point, is_local=False):
    return mb.point_jacobian(link_index, point, is_local)


def inverse_dynamics(mb: TinyMultiBody, qdd, gravity):
    return _id(mb.model, mb.q, mb.qd, jnp.asarray(qdd), jnp.asarray(gravity))
