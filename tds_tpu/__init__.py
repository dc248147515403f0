"""tds_tpu — a TPU-native differentiable rigid-body physics framework.

A from-scratch JAX/XLA implementation of the capabilities of
tiny-differentiable-simulator (Featherstone articulated-body dynamics,
impulse-level LCP contact, penalty contact, URDF models, RL environments,
ARS training), designed TPU-first:

- every physics function is pure: ``(model, state, inputs) -> state``
- model topology (joint types, parents, index layout) is static Python so
  per-model step functions trace once and compile to a single XLA program
- batching is ``jax.vmap``; multi-chip scaling is ``jax.sharding`` over a
  device ``Mesh`` (see ``tds_tpu.parallel``)
- gradients come from ``jax.grad`` through whole rollouts (``lax.scan`` +
  rematerialisation), replacing the reference's CppAD/CppADCodeGen stack

Reference behavior parity targets are cited per-module as
``/root/reference/<file>:<line>``.
"""

from tds_tpu import algebra
from tds_tpu.algebra.transform import Transform
from tds_tpu.algebra.inertia import RigidBodyInertia, ArticulatedBodyInertia

__version__ = "0.1.0"
