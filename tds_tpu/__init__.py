"""tds_tpu — a TPU-native differentiable rigid-body physics framework.

A from-scratch JAX/XLA implementation of the capabilities of
tiny-differentiable-simulator (Featherstone articulated-body dynamics,
impulse-level LCP contact, penalty contact, URDF models, RL environments,
ARS/PPO training, convex MPC), designed TPU-first:

- every physics function is pure: ``(model, state, inputs) -> state``
- model topology (joint types, parents, index layout) is static Python so
  per-model step functions trace once and compile to a single XLA program
- batching is ``jax.vmap``; multi-chip scaling is ``jax.sharding`` over a
  device ``Mesh`` (see ``tds_tpu.parallel``)
- gradients come from ``jax.grad`` through whole rollouts (``lax.scan`` +
  rematerialisation), replacing the reference's CppAD/CppADCodeGen stack

Reference behavior parity targets are cited per-module as
``/root/reference/<file>:<line>``; see COVERAGE.md for the component map.
"""

from tds_tpu import algebra
from tds_tpu.algebra.inertia import ArticulatedBodyInertia, RigidBodyInertia
from tds_tpu.algebra.transform import Transform
from tds_tpu.dynamics import (
    forward_dynamics,
    forward_kinematics,
    integrate_euler,
    integrate_euler_qdd,
)
from tds_tpu.dynamics.inverse_dynamics import inverse_dynamics
from tds_tpu.dynamics.jacobian import point_jacobian
from tds_tpu.dynamics.mass_matrix import mass_matrix
from tds_tpu.model.geometry import (
    Box,
    Capsule,
    Cylinder,
    GeomAttachment,
    Heightfield,
    Mesh,
    Plane,
    Sphere,
)
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyBuilder, MultiBodyModel, MultiBodyState
from tds_tpu.urdf.cache import construct as load_urdf
from tds_tpu.world import World, build_world, make_ground_plane, world_step

__version__ = "0.1.0"
