"""Semi-implicit Euler integration with quaternion handling.

Mirrors src/dynamics/integrator.hpp:9-196:
- velocities first: qd += qdd*dt
- floating base orientation via the world-frame quaternion derivative
  (quat_velocity, integrator.hpp:47-48), renormalized
- spherical joints via the body-frame quaternion derivative plus the
  pow(joint_damping, 1000*dt) velocity decay (integrator.hpp:107-118;
  joint_damping defaults to 0.995, multi_body.hpp:51)
- ``integrate_euler_qdd`` is the velocity-only half step presented to the
  constraint solver (integrator.hpp:140-182)
"""

import jax.numpy as jnp

from tds_tpu.algebra import quaternion
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyModel
from tds_tpu.algebra.update import set_index, set_slice


def integrate_euler_qdd(model: MultiBodyModel, q, qd, qdd, dt):
    """Velocity half-step only: qd += qdd*dt (all DoF). Returns qd."""
    return qd + qdd * dt


def integrate_euler(model: MultiBodyModel, q, qd, qdd, dt):
    """Full semi-implicit Euler step. Returns (q, qd)."""
    qd = qd + qdd * dt
    q, qd = integrate_q(model, q, qd, dt)
    return q, qd


def integrate_q(model: MultiBodyModel, q, qd, dt):
    """Position update from (already updated) velocities.

    Returns (q, qd) — qd comes back because spherical joints apply the
    joint_damping velocity decay during this phase (integrator.hpp:107-112).
    """
    if model.is_floating:
        w_world = qd[..., 0:3]
        base_rot = quaternion.integrate_world(q[..., 0:4], w_world, dt)
        q = set_slice(q, 0, base_rot)
        q = set_slice(q, 4, q[..., 4:7] + qd[..., 3:6] * dt)

    for i in range(model.num_links):
        jt = JointType(model.joint_types[i])
        if jt == JointType.FIXED:
            continue
        qo, qdo = model.q_offsets[i], model.qd_offsets[i]
        if jt == JointType.SPHERICAL:
            damping = jnp.power(model.joint_damping, dt * 1000.0)
            qd = set_slice(qd, qdo, qd[..., qdo : qdo + 3] * damping)
            quat = q[..., qo : qo + 4]
            new_quat = quaternion.integrate_local(quat, qd[..., qdo : qdo + 3], dt)
            q = set_slice(q, qo, new_quat)
        else:
            q = set_index(q, qo, q[..., qo] + qd[..., qdo] * dt)
    return q, qd
