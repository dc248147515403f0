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


# ---- math parity names (pytinydiffsim.inl vector/quaternion surface) -------
def VectorX(values):
    return jnp.asarray(values, dtype=jnp.result_type(float))


quat_from_euler_rpy = None  # assigned below (needs rotation import)


def _quat_from_euler_rpy(rpy):
    from tds_tpu.algebra import rotation

    rpy = jnp.asarray(rpy)
    return _quat.from_matrix(rotation.from_rpy(rpy[..., 0], rpy[..., 1], rpy[..., 2]))


quat_from_euler_rpy = _quat_from_euler_rpy


def get_euler_rpy(q):
    """Quaternion -> roll/pitch/yaw (eigen_algebra.hpp get_euler_rpy)."""
    m = _quat.to_matrix(jnp.asarray(q))
    sy = jnp.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    roll = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    pitch = jnp.arctan2(-m[..., 2, 0], sy)
    yaw = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


quaternion_integrate = _quat.integrate_world
quat_velocity = _quat.velocity_world
quat_axis_angle = _quat.from_axis_angle


# ---- geometry (pytinydiffsim.inl TinyGeometry surface) ----------------------
from tds_tpu.model.geometry import (  # noqa: E402
    Box as TinyBox,
    Capsule as TinyCapsule,
    GeomAttachment,
    Plane as TinyPlane,
    Sphere as TinySphere,
)

# ---- single rigid body (pytinydiffsim.inl TinyRigidBody) --------------------
class TinyRigidBody:
    """Mutable veneer over the functional rigid body (rigid_body.py)."""

    def __init__(self, mass, inv_inertia_world=None, position=None):
        from tds_tpu import rigid_body as _rb

        self.params = _rb.RigidBodyParams.create(mass, inv_inertia_world)
        self.state = _rb.RigidBodyState.create(position=position)
        self._rb = _rb

    @property
    def world_pose(self):
        return self.state.position, self.state.orientation

    def apply_gravity(self, gravity):
        self.state = self._rb.apply_gravity(self.state, self.params, jnp.asarray(gravity))

    def apply_central_force(self, force):
        self.state = self._rb.apply_central_force(self.state, jnp.asarray(force))

    def apply_force_impulse(self, dt):
        self.state = self._rb.apply_force_impulse(self.state, self.params, dt)

    def apply_impulse(self, impulse, rel_pos):
        self.state = self._rb.apply_impulse(
            self.state, self.params, jnp.asarray(impulse), jnp.asarray(rel_pos)
        )

    def clear_forces(self):
        self.state = self._rb.clear_forces(self.state)

    def integrate(self, dt):
        self.state = self._rb.integrate(self.state, dt)


# ---- neural network (pytinydiffsim.inl TinyNeuralNetwork) -------------------
class TinyNeuralNetwork:
    """specification + flat parameters, compute() like the bindings."""

    def __init__(self, input_dim, layer_dims, activations=None, learn_bias=True):
        from tds_tpu.learn.nn import MLPSpec

        self.spec = MLPSpec(input_dim, layer_dims, activations, use_bias=learn_bias)
        self.params = jnp.zeros((self.spec.num_parameters,))

    @property
    def num_parameters(self):
        return self.spec.num_parameters

    def set_parameters(self, params):
        self.params = jnp.asarray(params)

    def compute(self, inputs):
        return self.spec.apply(self.params, jnp.asarray(inputs))

    def initialize(self, key=None, method="xavier"):
        import jax as _jax

        key = key if key is not None else _jax.random.PRNGKey(0)
        self.params = self.spec.init(key, scheme=method)
        return self.params


# ---- raycasting (pytinydiffsim.inl TinyRaycast) ------------------------------
def cast_rays(origins, targets, shapes, transforms):
    from tds_tpu.collision.raycast import cast_rays as _cast

    return _cast(jnp.asarray(origins), jnp.asarray(targets), shapes, transforms)


# ---- environments (pytinydiffsim.inl:1078-1185) ------------------------------
def ReacherEnv(**kw):
    from tds_tpu.envs.reacher import ReacherEnv as _E

    return _E(**kw)


def CartpoleEnv(**kw):
    from tds_tpu.envs.cartpole import CartpoleEnv as _E

    return _E(**kw)


def AntEnv(**kw):
    from tds_tpu.envs.ant import AntEnv as _E

    return _E(**kw)


def LaikagoEnv(**kw):
    from tds_tpu.envs.laikago import LaikagoEnv as _E

    return _E(**kw)


def _vectorized(env, num_envs, auto_reset=True):
    from tds_tpu.envs.vectorized import VectorizedEnv

    return VectorizedEnv(env, num_envs, auto_reset=auto_reset)


def VectorizedAntEnv(num_envs: int = 128, auto_reset: bool = True, **kw):
    """inl:1185 analog: batched ant env (vmap replaces the CUDA stepper)."""
    return _vectorized(AntEnv(**kw), num_envs, auto_reset)


def VectorizedLaikagoEnv(num_envs: int = 128, auto_reset: bool = True, **kw):
    """inl:1165 analog: batched laikago env."""
    return _vectorized(LaikagoEnv(**kw), num_envs, auto_reset)


def fraction(n, d):
    """Scalar-trait constant constructor (tiny_double_utils.h fraction)."""
    return float(n) / float(d)
