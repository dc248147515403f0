"""Single 6-DoF rigid bodies + per-contact sequential impulse solver.

Functional port of src/rigid_body.hpp:25-123 and the branchless variant of
RigidBodyConstraintSolver (src/rb_constraint_solver.hpp:35-114 — the
CppAD/traced path, which is the XLA-compatible formulation). Note: the
reference's inv_inertia_world_ is the identity for dynamic bodies (it is
never recomputed from geometry); parity is preserved by defaulting
``inv_inertia`` to eye(3)/mass-gated but a physical inertia may be supplied.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
from flax import struct

from tds_tpu.algebra import quaternion


@struct.dataclass
class RigidBodyState:
    position: jnp.ndarray  # (…, 3)
    orientation: jnp.ndarray  # (…, 4) xyzw
    linear_velocity: jnp.ndarray
    angular_velocity: jnp.ndarray
    total_force: jnp.ndarray
    total_torque: jnp.ndarray

    @staticmethod
    def create(position=None, orientation=None, dtype=jnp.float32):
        z = jnp.zeros(3, dtype)
        return RigidBodyState(
            position=jnp.asarray(position, dtype) if position is not None else z,
            orientation=(
                jnp.asarray(orientation, dtype)
                if orientation is not None
                else quaternion.identity(dtype)
            ),
            linear_velocity=z,
            angular_velocity=z,
            total_force=z,
            total_torque=z,
        )


class RigidBodyParams(NamedTuple):
    mass: jnp.ndarray  # (); 0 = static
    inv_inertia_world: jnp.ndarray  # (3, 3)

    @staticmethod
    def create(mass, inv_inertia_world=None, dtype=jnp.float32):
        mass = jnp.asarray(mass, dtype)
        if inv_inertia_world is None:
            # reference parity: identity for dynamic, zero for static
            # (rigid_body.hpp:49-53)
            inv_inertia_world = jnp.where(
                mass == 0.0, jnp.zeros((3, 3), dtype), jnp.eye(3, dtype=dtype)
            )
        return RigidBodyParams(mass, jnp.asarray(inv_inertia_world, dtype))

    @property
    def inv_mass(self):
        return jnp.where(self.mass == 0.0, 0.0, 1.0 / jnp.maximum(self.mass, 1e-30))


def apply_gravity(state: RigidBodyState, params, gravity) -> RigidBodyState:
    return state.replace(
        total_force=state.total_force + params.mass * jnp.asarray(gravity)
    )


def apply_central_force(state: RigidBodyState, force) -> RigidBodyState:
    return state.replace(total_force=state.total_force + force)


def apply_force_impulse(state: RigidBodyState, params, dt) -> RigidBodyState:
    """Integrate accumulated force/torque into velocities (rigid_body.hpp:95)."""
    return state.replace(
        linear_velocity=state.linear_velocity
        + state.total_force * params.inv_mass * dt,
        angular_velocity=state.angular_velocity
        + jnp.einsum("...ij,...j->...i", params.inv_inertia_world, state.total_torque)
        * dt,
    )


def point_velocity(state: RigidBodyState, rel_pos):
    return state.linear_velocity + jnp.cross(state.angular_velocity, rel_pos)


def apply_impulse(state: RigidBodyState, params, impulse, rel_pos):
    """Impulse at a point relative to the COM (rigid_body.hpp:104-109)."""
    return state.replace(
        linear_velocity=state.linear_velocity + params.inv_mass * impulse,
        angular_velocity=state.angular_velocity
        + jnp.einsum(
            "...ij,...j->...i", params.inv_inertia_world, jnp.cross(rel_pos, impulse)
        ),
    )


def clear_forces(state: RigidBodyState) -> RigidBodyState:
    z = jnp.zeros_like(state.total_force)
    return state.replace(total_force=z, total_torque=z)


def integrate(state: RigidBodyState, dt) -> RigidBodyState:
    """Explicit Euler with quaternion increment (rigid_body.hpp:116-122)."""
    orn = quaternion.integrate_world(state.orientation, state.angular_velocity, dt)
    return state.replace(
        position=state.position + state.linear_velocity * dt, orientation=orn
    )


def resolve_contact_sequential_impulse(
    state_a: RigidBodyState,
    params_a: RigidBodyParams,
    state_b: RigidBodyState,
    params_b: RigidBodyParams,
    normal_on_b,
    point_a,
    point_b,
    distance,
    dt,
    friction=0.5,
    restitution=0.0,
    erp: float = 0.1,
):
    """Branchless per-contact normal + Coulomb friction impulse
    (rb_constraint_solver.hpp:73-114). Returns (state_a', state_b')."""
    rel_pos_a = point_a - state_a.position
    rel_pos_b = point_b - state_b.position
    active = ((distance < 0.0)).astype(distance.dtype)
    baumgarte = erp * distance / dt
    vel_a = point_velocity(state_a, rel_pos_a)
    vel_b = point_velocity(state_b, rel_pos_b)
    rel_vel = vel_a - vel_b
    vn = jnp.sum(normal_on_b * rel_vel, axis=-1)
    approaching = (vn < 0.0).astype(distance.dtype)

    t1 = jnp.einsum(
        "...ij,...j->...i", params_a.inv_inertia_world, jnp.cross(rel_pos_a, normal_on_b)
    )
    t2 = jnp.einsum(
        "...ij,...j->...i", params_b.inv_inertia_world, jnp.cross(rel_pos_b, normal_on_b)
    )
    ang = jnp.sum(
        normal_on_b * (jnp.cross(t1, rel_pos_a) + jnp.cross(t2, rel_pos_b)),
        axis=-1,
    )
    denom = params_a.inv_mass + params_b.inv_mass + ang
    impulse = (-(1.0 + restitution) * vn - baumgarte) / denom
    impulse = impulse * active * approaching
    impulse_vec = impulse[..., None] * normal_on_b

    from tds_tpu.algebra.spatial import safe_norm

    lateral = rel_vel - vn[..., None] * normal_on_b
    lat_norm = safe_norm(lateral, axis=-1)
    friction_trial = lat_norm / denom
    friction_impulse = jnp.minimum(friction_trial, friction * impulse)
    inv = jnp.where(lat_norm > 0.0, 1.0 / jnp.maximum(lat_norm, 1e-30), 0.0)
    friction_dir = lateral * inv[..., None]
    impulse_vec = impulse_vec - friction_impulse[..., None] * friction_dir

    state_a = apply_impulse(state_a, params_a, impulse_vec, rel_pos_a)
    state_b = apply_impulse(state_b, params_b, -impulse_vec, rel_pos_b)
    return state_a, state_b
