"""PD servo control (analog of src/tiny_pd_control.h:7-115 and the env-side
PD loop in locomotion_contact_simulation.h:170-257)."""

import jax.numpy as jnp

from tds_tpu.algebra import quaternion
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyModel
from tds_tpu.algebra.update import set_index, set_slice


def pd_force(kp, kd, q_desired, q_actual, qd_desired, qd_actual, max_force):
    """Scalar/elementwise PD with force clamping (tiny_pd_control.h)."""
    force = kp * (q_desired - q_actual) + kd * (qd_desired - qd_actual)
    return jnp.clip(force, -max_force, max_force)


def spherical_pd_error(q_desired, q_actual):
    """Rotation-vector error from actual to desired orientation — the
    stabilizing orientation error used for spherical-joint PD (analog of
    get_axis_difference_quaternion, src/math/matrix_utils.hpp:77-89)."""
    rel = quaternion.mul(quaternion.conjugate(q_actual), q_desired)
    return quaternion.to_axis_angle(rel)


def pd_tau(
    model: MultiBodyModel,
    q,
    qd,
    q_targets,
    kp,
    kd,
    max_force,
    skip_links: int = 0,
):
    """Full PD torque vector over actuated DoF.

    ``q_targets``: per-actuated-joint position targets (for spherical joints
    the target orientation is identity, matching the reference env,
    locomotion_contact_simulation.h:194-197). ``skip_links`` leaves the
    first joints passive (the fixed-base xyz_xyzrot floating-base emulation
    skips 6, locomotion_contact_simulation.h:180).
    """
    batch = q.shape[:-1]
    tau = jnp.zeros(batch + (model.dof_actuated,), dtype=q.dtype)
    base_off = 6 if model.is_floating else 0
    pose_index = 0
    for i in range(model.num_links):
        jt = JointType(model.joint_types[i])
        if jt == JointType.FIXED:
            continue
        t_off = model.qd_offsets[i] - base_off
        if i < skip_links:
            continue
        if jt == JointType.SPHERICAL:
            qo = model.q_offsets[i]
            q_actual = q[..., qo : qo + 4]
            qd_actual = qd[..., model.qd_offsets[i] : model.qd_offsets[i] + 3]
            err = spherical_pd_error(
                quaternion.identity(q.dtype), q_actual
            )
            force = jnp.clip(kp * err - kd * qd_actual, -max_force, max_force)
            tau = set_slice(tau, t_off, force)
            # COMPACT pose-vector convention: spherical joints consume NO
            # q_targets slots (their target is always identity). This
            # diverges from the reference's pose_index += 4
            # (locomotion_contact_simulation.h:220), whose 4 slots are dead
            # weight kept for a commented-out desired-orientation branch;
            # the envs here size initial_poses/actions over 1-DoF joints
            # only, and advancing by 4 misaligned every target after a
            # spherical joint (JAX clamps the out-of-bounds gather, so all
            # later joints silently tracked the LAST target).
        else:
            qo = model.q_offsets[i]
            target = q_targets[..., pose_index]
            force = pd_force(
                kp,
                kd,
                target,
                q[..., qo],
                0.0,
                qd[..., model.qd_offsets[i]],
                max_force,
            )
            tau = set_index(tau, t_off, force)
            pose_index += 1
    return tau
