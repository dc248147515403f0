"""Stance-leg torque mapping: MPC contact forces -> joint torques.

Port of examples/whole_body_control/torque_stance_leg_controller.hpp: for
each stance leg, tau_leg = J_foot^T (-f_world) restricted to that leg's
joint columns (the reference's MapContactForceToJointTorques).
"""

from typing import Sequence

import jax.numpy as jnp

from tds_tpu.dynamics.jacobian import point_jacobian_kin
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.model.multibody import MultiBodyModel


def stance_torques_from_forces(
    model: MultiBodyModel,
    q,
    foot_link_indices: Sequence[int],
    foot_positions_world,  # (num_legs, 3)
    forces_world,  # (num_legs, 3) MPC ground-reaction forces ON the robot
    contact_mask=None,  # (num_legs,) 1 for stance legs
):
    """Returns generalized torques (dof_qd,) applying -f at each stance foot
    (the reaction the actuators must produce)."""
    base_x, lxw, lxb = forward_kinematics_q(model, q)
    n = model.dof_qd
    tau = jnp.zeros(q.shape[:-1] + (n,), q.dtype)
    for leg, link in enumerate(foot_link_indices):
        jac = point_jacobian_kin(
            model, base_x, lxw, lxb, link, foot_positions_world[leg],
            batch=q.shape[:-1], dtype=q.dtype,
        )
        contrib = jnp.einsum("...ij,...i->...j", jac, -forces_world[leg])
        if contact_mask is not None:
            contrib = contrib * contact_mask[leg]
        tau = tau + contrib
    return tau
