"""pytinydiffsim-flavored compatibility shim.

The reference ships pybind11 modules (pytinydiffsim / _ad / _dual,
python/pytinydiffsim.inl) with a mutable, object-oriented API. This module
offers the most-used names on top of the functional core so reference
user scripts port mechanically; it is a convenience veneer — new code
should use the functional API directly (and gets jit/vmap/grad for free;
the _ad/_dual scalar-variant modules are unnecessary here because every
function is differentiable).

Covered surface: every class and free-function name the reference binds in
pytinydiffsim.inl (all 84 `py::class_`/`m.def` entries — verified by a
name sweep in tests; the _ad/_dual scalar-variant modules and the OpenGL
module are intentionally out, see the tail of this file): math types and
constructors, TinyMultiBody/TinyWorld/UrdfParser, the scalar-trait math
surface, contact-point and constraint-solver objects, actuators, IK,
TinyRaycast volume fitting, enums with export_values parity, env
simulation records and stateful EnvOutput-style adapters.
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
    """inl:1100 analog: .inl-style stateful API (reset()/step(a)/rollout)
    plus functional passthrough (reset(key)/step(state, action))."""
    from tds_tpu.envs.reacher import ReacherEnv as _E

    return TinyEnv(
        _E(**kw), output_cls=ReacherEnvOutput, rollout_cls=ReacherRolloutOutput
    )


def CartpoleEnv(**kw):
    from tds_tpu.envs.cartpole import CartpoleEnv as _E

    return TinyEnv(
        _E(**kw), output_cls=CartpoleEnvOutput, rollout_cls=CartpoleRolloutOutput
    )


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
    """inl:1185 analog: batched ant env (vmap replaces the CUDA stepper).
    Returns a TinyVectorizedEnv adapter: functional reset(key)/step(states,
    actions) passthrough PLUS the stateful .inl API (defined below)."""
    return TinyVectorizedEnv(
        _vectorized(AntEnv(**kw), num_envs, auto_reset),
        urdf_filename="gym/ant_org_xyz_xyzrot.urdf",
        output_cls_name="VectorizedAntEnvOutput",
    )


def VectorizedLaikagoEnv(num_envs: int = 128, auto_reset: bool = True, **kw):
    """inl:1165 analog: batched laikago env."""
    return TinyVectorizedEnv(
        _vectorized(LaikagoEnv(**kw), num_envs, auto_reset),
        urdf_filename="laikago/laikago_toes_zup_xyz_xyzrot.urdf",
        output_cls_name="VectorizedLaikagoEnvOutput",
    )


def fraction(n, d):
    """Scalar-trait constant constructor (tiny_double_utils.h fraction)."""
    return float(n) / float(d)


# ---- scalar-trait math surface (pytinydiffsim.inl:676-686) ------------------
def pi():
    return float(np.pi)


def copy(x):
    """Value copy (inl:658); jnp arrays are immutable so + 0 suffices."""
    return jnp.asarray(x) + 0


def cos(x):
    return jnp.cos(x)


def sin(x):
    return jnp.sin(x)


def acos(x):
    return jnp.arccos(x)


def sqrt(x):
    return jnp.sqrt(x)


def max(a, b):  # noqa: A001 - name parity with the bindings
    return jnp.maximum(a, b)


def min(a, b):  # noqa: A001
    return jnp.minimum(a, b)


def clip(x, lo, hi):
    return jnp.clip(x, lo, hi)


def where_gt(a, b, if_true, if_false):
    return jnp.where(a > b, if_true, if_false)


def where_lt(a, b, if_true, if_false):
    return jnp.where(a < b, if_true, if_false)


def where_eq(a, b, if_true, if_false):
    return jnp.where(a == b, if_true, if_false)


def quat_difference(start, end):
    """Shortest-arc difference quaternion start^-1 * end (inl:670)."""
    start, end = jnp.asarray(start), jnp.asarray(end)
    # pick the sign of `end` on the same hemisphere as `start`
    end = jnp.where(jnp.sum(start * end, axis=-1, keepdims=True) < 0.0, -end, end)
    return _quat.mul(_quat.conjugate(start), end)


def quaternion_axis_angle(axis, angle):
    """inl:671 Quaternion_Axis_Angle."""
    return _quat.from_axis_angle(jnp.asarray(axis), jnp.asarray(angle))


def matrix_to_euler_xyz(m):
    """inl:673 analog (extrinsic xyz = rpy of the matrix)."""
    m = jnp.asarray(m)
    sy = jnp.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    return jnp.stack(
        [
            jnp.arctan2(m[..., 2, 1], m[..., 2, 2]),
            jnp.arctan2(-m[..., 2, 0], sy),
            jnp.arctan2(m[..., 1, 0], m[..., 0, 0]),
        ],
        axis=-1,
    )


def quat_integrate(q, angular_velocity, dt):
    """inl:666 MyQuatIntegrate."""
    return _quat.integrate_world(jnp.asarray(q), jnp.asarray(angular_velocity), dt)


def find_file(name):
    """inl:669 MyFindFile via the bundled-data-first search order."""
    from tds_tpu.utils.file_utils import find_file as _ff

    return _ff(name)


def forward_kinematics(mb: TinyMultiBody):
    """inl:660: refresh world poses; returns (base_x_world, links_x_world)."""
    from tds_tpu.dynamics.kinematics import forward_kinematics_q

    base_x, links_x, _ = forward_kinematics_q(mb.model, mb.q)
    return base_x, links_x


def integrate_euler_qdd(mb: TinyMultiBody, dt):
    """inl:663: velocity update from qdd only (position untouched)."""
    from tds_tpu.dynamics.integrator import integrate_euler_qdd as _ieq

    mb.qd = _ieq(mb.model, mb.q, mb.qd, mb.qdd, dt)


def link_transform_base_frame(mb: TinyMultiBody, link_index: int):
    """inl:668 MyGetLinkTransformInBase."""
    from tds_tpu.dynamics.kinematics import forward_kinematics_q

    base_x, links_x, _ = forward_kinematics_q(mb.model, mb.q)
    return base_x.inverse().compose(links_x[link_index])


def compute_inertia_dyad(mass, com, inertia_c):
    """inl:664 MyComputeInertia -> RigidBodyInertia."""
    from tds_tpu.algebra.inertia import RigidBodyInertia

    return RigidBodyInertia.from_mass_com_inertia(
        jnp.asarray(mass), jnp.asarray(com), jnp.asarray(inertia_c)
    )


# ---- contact-point classes (pytinydiffsim.inl:751-807) ----------------------
class TinyContactPoint:
    """Field-name-parity mutable record (ContactPoint, contact_point.hpp)."""

    def __init__(self):
        self.world_normal_on_b = jnp.zeros(3)
        self.world_point_on_a = jnp.zeros(3)
        self.world_point_on_b = jnp.zeros(3)
        self.distance = 0.0
        self.normal_force = 0.0
        self.lateral_friction_force_1 = 0.0
        self.lateral_friction_force_2 = 0.0
        self.fr_direction_1 = jnp.zeros(3)
        self.fr_direction_2 = jnp.zeros(3)


class TinyContactPointRigidBody(TinyContactPoint):
    """inl:773-787: contact between two TinyRigidBody instances."""

    def __init__(self):
        super().__init__()
        self.rigid_body_a: Optional[TinyRigidBody] = None
        self.rigid_body_b: Optional[TinyRigidBody] = None
        self.restitution = 0.0
        self.friction = 0.5


class TinyContactPointMultiBody(TinyContactPoint):
    """inl:789-807: contact between two TinyMultiBody instances."""

    def __init__(self):
        super().__init__()
        self.multi_body_a: Optional[TinyMultiBody] = None
        self.multi_body_b: Optional[TinyMultiBody] = None
        self.restitution = 0.0
        self.friction = 0.5
        self.link_a = -1
        self.link_b = -1


# ---- constraint solvers (pytinydiffsim.inl:809-856) -------------------------
class TinyConstraintSolver:
    """Rigid-body sequential-impulse solver veneer (inl:809-813)."""

    def resolve_collision(self, cp: TinyContactPointRigidBody, dt):
        from tds_tpu import rigid_body as _rb

        a, b = cp.rigid_body_a, cp.rigid_body_b
        a.state, b.state = _rb.resolve_contact_sequential_impulse(
            a.state,
            a.params,
            b.state,
            b.params,
            jnp.asarray(cp.world_normal_on_b),
            jnp.asarray(cp.world_point_on_a),
            jnp.asarray(cp.world_point_on_b),
            jnp.asarray(cp.distance),
            dt,
            friction=cp.friction,
            restitution=cp.restitution,
        )


def _mb_contact_batch(cps):
    """Stack TinyContactPointMultiBody records into a ContactBatch."""
    from tds_tpu.collision.narrowphase import Contact
    from tds_tpu.contact.mlcp import ContactBatch

    contact = Contact(
        normal_on_b=jnp.stack([jnp.asarray(c.world_normal_on_b) for c in cps]),
        point_a=jnp.stack([jnp.asarray(c.world_point_on_a) for c in cps]),
        point_b=jnp.stack([jnp.asarray(c.world_point_on_b) for c in cps]),
        distance=jnp.asarray([c.distance for c in cps]),
    )
    return ContactBatch(
        contact=contact,
        link_a=tuple(c.link_a for c in cps),
        link_b=tuple(c.link_b for c in cps),
        friction=jnp.asarray([c.friction for c in cps]),
        restitution=jnp.asarray([c.restitution for c in cps]),
    )


class TinyMultiBodyConstraintSolver:
    """MLCP/PGS solver with the bindings' parameter names (inl:815-822:
    pgs_iterations_, keep_all_points_, cfm_, erp_)."""

    def __init__(self):
        self.pgs_iterations_ = 50
        self.keep_all_points_ = False
        self.cfm_ = 1e-5
        self.erp_ = 0.2
        self.num_friction_dir_ = 1

    def _params(self):
        from tds_tpu.contact.mlcp import ContactSolverParams as _P

        # keep_all_points_ has no analog knob: the batched solver always
        # emits every candidate row and masks non-penetrating ones, which is
        # the keep_all_points_=True semantics with zero-force inactive rows.
        return _P(
            pgs_iterations=self.pgs_iterations_,
            cfm=self.cfm_,
            erp=self.erp_,
            num_friction_dir=self.num_friction_dir_,
        )

    def resolve_collision(self, contact_points, dt):
        """Applies contact impulses; writes back qd on both multibodies
        (inl:819 resolve_collision2)."""
        from tds_tpu.contact.mlcp import resolve_collision as _rc

        if not contact_points:
            return
        cps = list(contact_points)
        a, b = cps[0].multi_body_a, cps[0].multi_body_b
        batch = _mb_contact_batch(cps)
        qd_a, qd_b, _ = _rc(
            a.model, a.q, a.qd, b.model, b.q, b.qd, batch, dt, self._params()
        )
        a.qd, b.qd = qd_a, qd_b


class TinyMultiBodyConstraintSolverSpring:
    """Spring/penalty solver with the bindings' parameter names
    (inl:836-856; reference ships this surface behind `#if 0`)."""

    def __init__(self):
        self.spring_k = 5000.0
        self.damper_d = 100.0
        self.hard_contact_condition = True
        self.exponent_n = 1.0
        self.smoothing_method = 0
        self.smooth_alpha_vel = 100.0
        self.smooth_alpha_normal = -1.0
        self.mu_static = 0.5
        self.andersson_vs = 0.1
        self.andersson_p = 1.0
        self.andersson_ktanh = 10.0
        self.v_transition = 0.01
        self.friction_model = 0

    def _params(self):
        from tds_tpu.contact.spring import SpringContactParams as _P

        return _P(
            spring_k=self.spring_k,
            damper_d=self.damper_d,
            hard_contact_condition=self.hard_contact_condition,
            exponent_n=self.exponent_n,
            smoothing_method=self.smoothing_method,
            smooth_alpha_vel=self.smooth_alpha_vel,
            smooth_alpha_normal=self.smooth_alpha_normal,
            mu_static=self.mu_static,
            andersson_vs=self.andersson_vs,
            andersson_p=self.andersson_p,
            andersson_ktanh=self.andersson_ktanh,
            v_transition=self.v_transition,
            friction_model=self.friction_model,
        )

    def compute_contact_force(self, distance, vn):
        from tds_tpu.contact.spring import compute_contact_force as _f

        return _f(jnp.asarray(distance), jnp.asarray(vn), self._params())

    def compute_friction_force(self, f_n, v_t):
        from tds_tpu.contact.spring import compute_friction_force as _f

        return _f(jnp.asarray(f_n), jnp.asarray(v_t), self._params())

    def resolve_collision(self, contact_points, dt):
        from tds_tpu.contact.spring import resolve_collision_spring as _rc

        if not contact_points:
            return
        cps = list(contact_points)
        a, b = cps[0].multi_body_a, cps[0].multi_body_b
        batch = _mb_contact_batch(cps)
        qd_a, qd_b, _ = _rc(
            a.model, a.q, a.qd, b.model, b.q, b.qd, batch, dt, self._params()
        )
        a.qd, b.qd = qd_a, qd_b


# ---- inverse kinematics (inl:667, pytinydiffsim_includes.h:325-341) ---------
def inverse_kinematics_compat(mb: TinyMultiBody, target_link_index, target_point):
    """MyInverseKinematics: damped-pinv IK toward one point target, seeded
    at the body's current q (alpha=0.3, weight_reference=0 as in the
    reference wrapper). Returns q_target without mutating the body."""
    res = inverse_kinematics(
        mb.model,
        [IKTarget(int(target_link_index), jnp.asarray(target_point))],
        mb.q,
        method=IKMethod.DAMPED_LM,
        alpha=0.3,
        q_reference=mb.q,
        q_reference_weight=0.0,
    )
    return res.q


# ---- actuators (tiny_actuator.h; reference binds none — bonus surface) ------
class TinyActuator:
    """tiny_actuator.h:30-76: gear ratios + limits applied to u -> tau."""

    def __init__(self, dof):
        self.dof = dof
        self.gear_ratios = jnp.ones(dof)
        self.limits = jnp.full(dof, jnp.inf)

    def compute_torques(self, u):
        from tds_tpu.control.actuators import DirectActuator

        act = DirectActuator(gear_ratios=self.gear_ratios, limits=self.limits)
        tau, _ = act.compute_torques((), None, None, jnp.asarray(u))
        return tau


class TinyUrdfParser:
    """TinyUrdfParser binding shape (inl:1013-1015): load_urdf returns the
    parsed UrdfStructures (convert separately via UrdfToMultiBody2)."""

    def load_urdf(self, path):
        from tds_tpu.urdf.parser import parse_urdf_file

        return parse_urdf_file(path)

    def load_urdf_from_string(self, text):
        from tds_tpu.urdf.parser import parse_urdf_string

        return parse_urdf_string(text)


class UrdfToMultiBody2:
    """inl:1032-1034: convert parsed structures into a multibody."""

    def convert2(self, urdf_structures, world=None, is_floating=False):
        from tds_tpu.urdf.converter import convert_to_multibody

        model, geoms = convert_to_multibody(urdf_structures, is_floating)
        mb = TinyMultiBody(model, geoms)
        if world is not None:
            world.bodies.append(mb)
            world._world = None
        return mb


class TinyServoActuator:
    """PD-servo actuator (control/actuators.py ServoActuator veneer)."""

    def __init__(self, dof, kp=100.0, kd=2.0, min_force=-500.0, max_force=500.0):
        from tds_tpu.control.actuators import ServoActuator as _S

        self.dof = dof
        self._act = _S(kp=kp, kd=kd, min_force=min_force, max_force=max_force)

    def compute_torques(self, q, qd, target_positions):
        tau, _ = self._act.compute_torques(
            (), jnp.asarray(q), jnp.asarray(qd), jnp.asarray(target_positions)
        )
        return tau


# ---- URDF structure classes (pytinydiffsim.inl:896-1035) --------------------
# The reference binds the raw parsed-URDF records so scripts can build or
# edit robots programmatically; ours are plain dataclasses with the same
# field names (urdf/structures.py).
from tds_tpu.urdf.structures import (  # noqa: E402
    UrdfCollision as TinyUrdfCollision,
    UrdfGeometry as TinyUrdfGeometry,
    UrdfInertial as TinyUrdfInertial,
    UrdfJoint as TinyUrdfJoint,
    UrdfLink as TinyUrdfLink,
    UrdfStructures as TinyUrdfStructures,
    UrdfVisual as TinyUrdfVisual,
)

# ---- matrix constructors (pytinydiffsim.inl Matrix surface) ------------------
# The bindings expose fixed/dynamic matrix types; here every matrix is a jnp
# array, so these are shape-checked constructors (zeros by default, identity
# for the square 3x3 as in the reference's default-constructed TinyMatrix3x3).
def Matrix3(values=None):
    if values is None:
        return jnp.eye(3)
    m = jnp.asarray(values, dtype=jnp.result_type(float))
    assert m.shape[-2:] == (3, 3), f"Matrix3 expects 3x3, got {m.shape}"
    return m


def Matrix(rows, cols=None):
    """MatrixXxX: Matrix(r, c) -> zeros; Matrix(nested_list) -> array."""
    if cols is not None:
        return jnp.zeros((int(rows), int(cols)))
    return jnp.asarray(rows, dtype=jnp.result_type(float))


def Matrix3X(cols_or_values):
    if isinstance(cols_or_values, int):
        return jnp.zeros((3, cols_or_values))
    m = jnp.asarray(cols_or_values, dtype=jnp.result_type(float))
    assert m.shape[-2] == 3, f"Matrix3X expects 3 rows, got {m.shape}"
    return m


def Matrix6x3(values=None):
    if values is None:
        return jnp.zeros((6, 3))
    m = jnp.asarray(values, dtype=jnp.result_type(float))
    assert m.shape[-2:] == (6, 3), f"Matrix6x3 expects 6x3, got {m.shape}"
    return m


TinyMatrix3x3 = Matrix3
TinyMatrix3xX = Matrix3X
TinyMatrixXxX = Matrix
TinyVectorX = VectorX
TinyVector3 = Vector3
TinyQuaternion = Quaternion


# ---- enums (pytinydiffsim.inl:525-546,719-741,827-833) -----------------------
import enum as _enum  # noqa: E402

from tds_tpu.model.joints import JointType as _JointType  # noqa: E402


class TinyJointType(_enum.IntEnum):
    """JointType with the bindings' JOINT_* spelling (link.hpp:9-21; values
    identical to model.joints.JointType)."""

    JOINT_FIXED = int(_JointType.FIXED)
    JOINT_PRISMATIC_X = int(_JointType.PRISMATIC_X)
    JOINT_PRISMATIC_Y = int(_JointType.PRISMATIC_Y)
    JOINT_PRISMATIC_Z = int(_JointType.PRISMATIC_Z)
    JOINT_PRISMATIC_AXIS = int(_JointType.PRISMATIC_AXIS)
    JOINT_REVOLUTE_X = int(_JointType.REVOLUTE_X)
    JOINT_REVOLUTE_Y = int(_JointType.REVOLUTE_Y)
    JOINT_REVOLUTE_Z = int(_JointType.REVOLUTE_Z)
    JOINT_REVOLUTE_AXIS = int(_JointType.REVOLUTE_AXIS)
    JOINT_SPHERICAL = int(_JointType.SPHERICAL)
    JOINT_INVALID = -2


class TinyGeometryTypes(_enum.IntEnum):
    """geometry.hpp:30-38 values (SPHERE=0, PLANE, CAPSULE, MESH, BOX,
    CYLINDER)."""

    SPHERE_TYPE = 0
    PLANE_TYPE = 1
    CAPSULE_TYPE = 2
    MESH_TYPE = 3
    BOX_TYPE = 4
    CYLINDER_TYPE = 5


from tds_tpu.learn.nn import Activation as _Activation  # noqa: E402


class NeuralNetworkActivation(_enum.IntEnum):
    """math/neural_network.hpp:33-42 values (== learn.nn.Activation)."""

    NN_ACT_IDENTITY = int(_Activation.IDENTITY)
    NN_ACT_TANH = int(_Activation.TANH)
    NN_ACT_SIN = int(_Activation.SIN)
    NN_ACT_RELU = int(_Activation.RELU)
    NN_ACT_SOFT_RELU = int(_Activation.SOFT_RELU)
    NN_ACT_ELU = int(_Activation.ELU)
    NN_ACT_SIGMOID = int(_Activation.SIGMOID)
    NN_ACT_SOFTSIGN = int(_Activation.SOFTSIGN)


class NeuralNetworkInitialization(_enum.IntEnum):
    """math/neural_network.hpp:44-48."""

    NN_INIT_ZERO = -1
    NN_INIT_XAVIER = 0
    NN_INIT_HE = 1


from tds_tpu.contact.spring import VelocitySmoothing as _VelSmooth  # noqa: E402


class TinyVelocitySmoothingMethod(_enum.IntEnum):
    """mb_constraint_solver_spring smoothing enum (== spring.VelocitySmoothing)."""

    SMOOTH_VEL_NONE = int(_VelSmooth.NONE)
    SMOOTH_VEL_SIGMOID = int(_VelSmooth.SIGMOID)
    SMOOTH_VEL_TANH = int(_VelSmooth.TANH)
    SMOOTH_VEL_ABS = int(_VelSmooth.ABS)


# export_values() parity: the reference injects enum members at module scope
for _e in (
    TinyJointType,
    TinyGeometryTypes,
    NeuralNetworkActivation,
    NeuralNetworkInitialization,
    TinyVelocitySmoothingMethod,
):
    for _member in _e:
        globals()[_member.name] = _member
del _e, _member


# ---- TinyPose / TinyLink / ArticulatedBodyInertia (inl:450-457,548-561) ------
from tds_tpu.algebra.inertia import (  # noqa: E402
    ArticulatedBodyInertia,
    RigidBodyInertia,
)


class TinyPose:
    """Position + quaternion pose (pose.hpp veneer; inl:450-457)."""

    def __init__(self, position=None, orientation=None):
        self.position = jnp.zeros(3) if position is None else jnp.asarray(position)
        self.orientation = (
            jnp.asarray([0.0, 0.0, 0.0, 1.0])
            if orientation is None
            else jnp.asarray(orientation)
        )

    def transform(self, point):
        r = _quat.to_matrix(self.orientation)
        return self.position + r @ jnp.asarray(point)

    def inverse_transform(self, point):
        r = _quat.to_matrix(self.orientation)
        return r.T @ (jnp.asarray(point) - self.position)


class TinyLink:
    """Standalone link record (link.hpp veneer; inl:548-561). The functional
    core keeps links inside the static MultiBodyModel pytree; this class
    exists for scripts that build/inspect links imperatively."""

    def __init__(self, joint_type, X_T, rbi: RigidBodyInertia):
        self.joint_type = TinyJointType(int(joint_type))
        self.X_T = X_T  # parent-to-joint frame Transform
        self.rbi = rbi
        self.axis = jnp.asarray([1.0, 0.0, 0.0])  # for *_AXIS joints
        self.stiffness = 0.0
        self.damping = 0.0
        self.link_name = ""
        self.joint_name = ""
        self.q_index = -1
        self.qd_index = -1
        self.world_transform = None  # set by jcalc

    def set_joint_type(self, joint_type):
        self.joint_type = TinyJointType(int(joint_type))

    def jcalc(self, q_link, parent_transform=None):
        """X_parent = X_T * X_J(q); stores & returns the world transform
        given the parent's (identity if omitted). link.hpp:229-287 analog."""
        from tds_tpu.algebra.transform import Transform as _T
        from tds_tpu.model.joints import jcalc_transform

        q_link = jnp.atleast_1d(jnp.asarray(q_link, dtype=jnp.result_type(float)))
        x_parent = jcalc_transform(
            _JointType(int(self.joint_type)), self.X_T, self.axis, q_link
        )
        base = _T.identity() if parent_transform is None else parent_transform
        self.world_transform = base.compose(x_parent)
        return self.world_transform


# ---- TinyRaycast shape-fitting utility (inl:879-891) -------------------------
class TinyRaycastResult:
    """tiny_raycast.h TinyRaycastResult (hit_fraction, collider_index)."""

    def __init__(self, hit_fraction=1.0, collider_index=-1):
        self.hit_fraction = float(hit_fraction)
        self.collider_index = int(collider_index)

    def __repr__(self):
        return f"TinyRaycastResult({self.hit_fraction:.6f}, {self.collider_index})"


class TinyRaycast:
    """Entry/exit ray sweeps over TinyUrdfCollision shapes plus the
    interval-union volume estimators the reference's shape-fitting examples
    use (tiny_raycast.h:92-265). Host-side utility (plain Python over small
    ray grids), not a sim hot path — the traced-path raycaster lives in
    collision/raycast.py."""

    @staticmethod
    def _collider_intervals(ray_from, ray_to, collider):
        """[(t_enter, t_exit)] of the ray segment inside one collider."""
        import math

        f = np.asarray(ray_from, dtype=float)
        t = np.asarray(ray_to, dtype=float)
        d = t - f
        geom = collider.geometry
        kind = geom.geom_type
        if kind == "sphere":
            rs = f - np.asarray(collider.origin_xyz, dtype=float)
            a = float(d @ d)
            b = float(rs @ d)
            c = float(rs @ rs) - geom.radius**2
            disc = b * b - a * c
            if disc <= 0.0 or a == 0.0:
                return []
            sq = math.sqrt(disc)
            t0, t1 = (-b - sq) / a, (-b + sq) / a
        elif kind == "box":
            from tds_tpu.algebra import rotation as _rot

            rpy = np.asarray(collider.origin_rpy, dtype=float)
            r = np.asarray(_rot.from_rpy(rpy[0], rpy[1], rpy[2]))
            o = np.asarray(collider.origin_xyz, dtype=float)
            fl, dl = r.T @ (f - o), r.T @ d
            half = np.asarray(geom.extents, dtype=float) / 2.0
            # slab method
            t0, t1 = -np.inf, np.inf
            for ax in range(3):
                if abs(dl[ax]) < 1e-300:
                    if abs(fl[ax]) > half[ax]:
                        return []
                    continue
                lo = (-half[ax] - fl[ax]) / dl[ax]
                hi = (half[ax] - fl[ax]) / dl[ax]
                t0, t1 = np.maximum(t0, np.minimum(lo, hi)), np.minimum(
                    t1, np.maximum(lo, hi)
                )
            if not np.isfinite(t0) or not np.isfinite(t1):
                return []
        else:
            raise NotImplementedError(
                f"TinyRaycast supports sphere and box colliders, got {kind!r} "
                "(matches the reference, tiny_raycast.h:106-155)"
            )
        t0c, t1c = np.clip(t0, 0.0, 1.0), np.clip(t1, 0.0, 1.0)
        if t1 < 0.0 or t0 > 1.0 or t1c <= t0c:
            return []
        return [(float(t0c), float(t1c))]

    def cast_rays(self, rays_from, rays_to, collision_objects):
        """Per-ray sorted entry/exit TinyRaycastResult lists (inl cast_rays)."""
        out = []
        for f, t in zip(rays_from, rays_to):
            hits = []
            for ci, col in enumerate(collision_objects):
                for t0, t1 in self._collider_intervals(f, t, col):
                    hits.append(TinyRaycastResult(t0, ci))
                    hits.append(TinyRaycastResult(t1, ci))
            hits.sort(key=lambda h: h.hit_fraction)
            out.append(hits)
        return out

    @staticmethod
    def _union_intervals(hits):
        """Merge a ray's sorted entry/exit events into disjoint occupied
        [t0, t1) intervals (any collider counts)."""
        open_count = {}
        inside = 0
        spans = []
        start = 0.0
        for h in hits:
            c = h.collider_index
            if open_count.get(c, 0) > 0:  # exit event
                open_count[c] -= 1
                inside -= 1
                if inside == 0:
                    spans.append((start, h.hit_fraction))
            else:  # entry event
                open_count[c] = open_count.get(c, 0) + 1
                if inside == 0:
                    start = h.hit_fraction
                inside += 1
        return spans

    def volume(self, results, num_objects=None):
        """Sum over rays of the union footprint along each ray
        (tiny_raycast.h:166-197 semantics; scale by ray length * cell area
        outside, as the reference examples do)."""
        del num_objects  # implied by the events themselves here
        total = 0.0
        for hits in results:
            for t0, t1 in self._union_intervals(hits):
                total += t1 - t0
        return total

    def intersection_volume(self, results_target, results_prims, num_objects=None):
        """Footprint covered by BOTH the target shape and the primitive set
        (tiny_raycast.h:199-265 semantics via interval intersection)."""
        del num_objects
        total = 0.0
        for t_hits, p_hits in zip(results_target, results_prims):
            ts = self._union_intervals(t_hits)
            ps = self._union_intervals(p_hits)
            for a0, a1 in ts:
                for b0, b1 in ps:
                    lo, hi = np.maximum(a0, b0), np.minimum(a1, b1)
                    if hi > lo:
                        total += float(hi - lo)
        return total


# ---- misc free functions (inl:493,672) ---------------------------------------
def get_debug_double(x):
    """Scalar -> python float (MyTinyConstants::getDouble)."""
    return float(np.asarray(x))


def mb_collision_geometries(mb: TinyMultiBody):
    """Collision geometries attached to a multibody (inl:672)."""
    return list(mb.geoms)


# ---- env simulations + stateful .inl-style env API (inl:940-1185) ------------
class CartpoleSimulation:
    """Record parity with the bound contact-sim structs: holds the resolved
    URDF path (cartpole_environment.h:27-70 analog)."""

    def __init__(self):
        self.m_urdf_filename = find_file("cartpole.urdf")


class ReacherSimulation:
    def __init__(self):
        self.m_urdf_filename = find_file("gym/reacher.urdf")


class AntContactSimulation:
    def __init__(self):
        self.m_urdf_filename = find_file("gym/ant_org_xyz_xyzrot.urdf")


class _EnvOutput:
    """obs/reward/done record (CartpoleEnvOutput et al., inl:947-975)."""

    def __init__(self, obs=None, reward=0.0, done=False):
        self.obs = obs
        self.reward = reward
        self.done = done


class CartpoleEnvOutput(_EnvOutput):
    pass


class ReacherEnvOutput(_EnvOutput):
    pass


class _RolloutOutput:
    def __init__(self, total_reward=0.0, num_steps=0):
        self.total_reward = total_reward
        self.num_steps = num_steps


class CartpoleRolloutOutput(_RolloutOutput):
    pass


class ReacherRolloutOutput(_RolloutOutput):
    pass


class TinyEnv:
    """Stateful .inl-flavoured adapter over any functional env: reset() ->
    obs, step(action) -> EnvOutput, rollout(params) -> RolloutOutput,
    init_neural_network / update_weights / policy / seed (inl:1078-1130).
    New code should use the functional env directly (jit/vmap/scan-able)."""

    _output_cls = _EnvOutput
    _rollout_cls = _RolloutOutput

    def __init__(self, env, rollout_length: int = 1000, output_cls=None,
                 rollout_cls=None):
        import jax as _jax

        from tds_tpu.learn.nn import linear_policy

        self.env = env
        self.rollout_length = rollout_length
        if output_cls is not None:
            self._output_cls = output_cls
        if rollout_cls is not None:
            self._rollout_cls = rollout_cls
        self._policy = linear_policy(env.observation_dim, env.action_dim)
        self._params = jnp.zeros(self._policy.num_parameters)
        self._key = _jax.random.PRNGKey(0)
        self._state = None

    def __getattr__(self, name):
        # delegate everything else (observation_dim, action_dim, model, ...)
        if name == "env":  # not yet set (unpickling) — avoid recursion
            raise AttributeError(name)
        return getattr(self.env, name)

    def seed(self, n):
        import jax as _jax

        self._key = _jax.random.PRNGKey(int(n))

    def _split(self):
        import jax as _jax

        self._key, sub = _jax.random.split(self._key)
        return sub

    def reset(self, key=None):
        if key is not None:  # functional passthrough
            return self.env.reset(key)
        self._state, obs = self.env.reset(self._split())
        return obs

    def step(self, a, b=None):
        if b is not None:  # functional passthrough: step(state, action)
            return self.env.step(a, b)
        self._state, obs, reward, done = self.env.step(self._state, jnp.asarray(a))
        return self._output_cls(obs=obs, reward=float(reward), done=bool(done))

    def init_neural_network(self, weights):
        self._params = jnp.asarray(weights)

    update_weights = init_neural_network

    def policy(self, obs):
        return self._policy.apply(self._params, jnp.asarray(obs))

    def rollout(self, weights=None, max_steps=None):
        from tds_tpu.envs.vectorized import rollout as _rollout

        params = self._params if weights is None else jnp.asarray(weights)
        total, steps = _rollout(
            self.env,
            self._policy.apply,
            params,
            self._split(),
            max_steps or self.rollout_length,
        )
        return self._rollout_cls(
            total_reward=float(total), num_steps=int(steps)
        )


class _VectorizedEnvOutput:
    """obs/rewards/dones + flattened link world poses for rendering
    (inl:1140-1160). visual_world_transforms is (num_envs, 1+links, 7)
    rows of [pos(3), quat xyzw(4)]."""

    def __init__(self, obs=None, rewards=None, dones=None, visual_world_transforms=None):
        self.obs = obs
        self.rewards = rewards
        self.dones = dones
        self.visual_world_transforms = visual_world_transforms


class VectorizedAntEnvOutput(_VectorizedEnvOutput):
    pass


class VectorizedLaikagoEnvOutput(_VectorizedEnvOutput):
    pass


class TinyVectorizedEnv:
    """Stateful adapter over VectorizedEnv with the .inl vectorized-env API
    (reset() -> obs, step(actions) -> Output with visual transforms,
    action_dim()/obs_dim()/urdf_filename()); ALSO passes through the
    functional reset(key)/step(states, actions) when called with the
    functional arity, so existing code keeps working."""

    def __init__(self, venv, urdf_filename="", output_cls_name=""):
        import jax as _jax

        self.venv = venv
        self.env = venv.env
        self._urdf = urdf_filename
        self._output_cls = (
            globals()[output_cls_name] if output_cls_name else _VectorizedEnvOutput
        )
        self._key = _jax.random.PRNGKey(0)
        self._states = None

    def action_dim(self):
        return self.env.action_dim

    def obs_dim(self):
        return self.env.observation_dim

    def urdf_filename(self):
        return self._urdf

    def _split(self):
        import jax as _jax

        self._key, sub = _jax.random.split(self._key)
        return sub

    def _visual_transforms(self, states):
        import jax as _jax

        from tds_tpu.dynamics.kinematics import forward_kinematics_q

        def one(q):
            base_x, links_x, _ = forward_kinematics_q(self.env.model, q)
            def pose7(x):
                return jnp.concatenate([x.pos, _quat.from_matrix(x.rot)])
            rows = [pose7(base_x)] + [pose7(x) for x in links_x]
            return jnp.stack(rows)

        return _jax.vmap(one)(states.q)

    def reset(self, key=None):
        if key is not None:  # functional passthrough
            return self.venv.reset(key)
        self._states, obs = self.venv.reset(self._split())
        return obs

    def step(self, a, b=None):
        if b is not None:  # functional passthrough: step(states, actions)
            return self.venv.step(a, b)
        self._states, obs, rewards, dones = self.venv.step(
            self._states, jnp.asarray(a)
        )
        return self._output_cls(
            obs=obs,
            rewards=rewards,
            dones=dones,
            visual_world_transforms=self._visual_transforms(self._states),
        )


# ---- intentionally NOT bound (with rationale) --------------------------------
# - pytinydiffsim_ad / _dual scalar-variant modules: every function here is
#   differentiable via jax.grad/jacfwd; there is nothing to switch.
# - pytinyopengl3 / TinyOpenGL3 windowed visualizer: no display on TPU
#   pods; MeshcatVisualizer + the software TinyRenderer cover visualization.
# - Fix64 scalar: XLA gives bitwise-reproducible f32/f64
#   (tests/test_determinism.py); a fixed-point scalar would forfeit the MXU.
# - PyBullet URDF import (b3RobotSimulatorClientAPI): needs a live Bullet
#   server process; the bundled URDF assets cover the reference's robots.
