"""Integrated whole-body MPC locomotion controller (trot walking).

Closes the loop the reference runs in
examples/whole_body_control/laikago_tds_mpc.cpp and the Python port
locomotion_controller.py: gait scheduler -> COM velocity estimator ->
Raibert swing-leg targets (+ per-leg IK -> joint PD) -> convex-MPC stance
forces (-> J^T torques), combined per leg by gait state (hybrid action,
raibert_swing_leg_controller.py:208-216 / torque_stance_leg_controller).

Everything is a pure traced function so the controller+physics loop jits
as one program; per-leg IK is a fixed-iteration damped Gauss-Newton that
moves only that leg's 3 joints (the reference delegates to the robot's
analytic ComputeMotorAnglesFromFootLocalPosition).
"""

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.algebra import rotation
from tds_tpu.control.mpc.convex_mpc import MpcConfig, compute_contact_forces
from tds_tpu.control.mpc.gait import (
    EARLY_CONTACT,
    STANCE,
    SWING,
    GaitConfig,
    VelocityFilterState,
    gait_update,
)
from tds_tpu.control.mpc.stance_leg import stance_torques_from_forces
from tds_tpu.control.mpc.swing_leg import (
    SwingLegState,
    raibert_foot_targets,
    swing_foot_positions,
    swing_leg_update,
)
from tds_tpu.dynamics.jacobian import point_jacobian_kin
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.model.multibody import MultiBodyModel


class LocomotionMpcConfig(NamedTuple):
    mpc: MpcConfig
    gait: GaitConfig
    desired_speed: Tuple[float, float, float] = (0.4, 0.0, 0.0)
    desired_twisting_speed: float = 0.0
    desired_height: float = 0.42
    foot_clearance: float = 0.01
    swing_kp: float = 100.0
    swing_kd: float = 1.0
    max_torque: float = 50.0
    ik_iterations: int = 6
    ik_damping: float = 0.02
    contact_height_threshold: float = 0.035  # toe-sphere radius + margin
    # COM velocity moving-window length in control ticks; the reference's
    # window of 20 robot steps at 1 kHz is ~20 ms — keep the lag comparable
    # at the (slower) control rate.
    velocity_filter_window: int = 4
    # seconds the gait clock advances per controller.update() call; must
    # equal env.dt * control_every when driven by make_walk_step
    control_dt: float = 0.001


class LocomotionMpcState(NamedTuple):
    time: jnp.ndarray  # ()
    swing: SwingLegState
    vel_filter: VelocityFilterState


def leg_structure(model: MultiBodyModel, toe_links: Sequence[int], num_passive=6):
    """Static per-leg info: for each toe link, the 3 actuated ancestor links
    and their qd indices (walks model.parents above the passive
    base-emulation chain)."""
    from tds_tpu.model.joints import JointType, qd_width

    legs = []
    for toe in toe_links:
        chain = []
        li = toe
        while li >= num_passive:
            if qd_width(JointType(model.joint_types[li])) == 1:
                chain.append(li)
            li = model.parents[li]
        chain.reverse()
        legs.append(tuple(chain))
    return tuple(tuple(model.qd_offsets[li] for li in chain) for chain in legs)


def hip_positions_base_frame(model: MultiBodyModel, toe_links, num_passive=6):
    """Hip (top leg link) origins in the base frame at the zero pose —
    the reference robot's GetHipPositionsInBaseFrame constants."""
    q0 = model.zero_q()
    base_x, lxw, _ = forward_kinematics_q(model, q0)
    base_pos = q0[0:3] * 0.0
    hips = []
    for toe in toe_links:
        li = toe
        chain = []
        while li >= num_passive:
            chain.append(li)
            li = model.parents[li]
        hip_link = chain[-1]  # topmost leg link
        hips.append(np.asarray(lxw[hip_link].pos))
    return jnp.asarray(np.stack(hips))


class LocomotionMpcController:
    """Builds jitted (state, q, qd) -> (state', tau_actuated) updates for a
    fixed-base *_xyz_xyzrot quadruped (6 passive dofs + 12 leg joints)."""

    def __init__(self, model: MultiBodyModel, toe_links, config: LocomotionMpcConfig):
        self.model = model
        self.toe_links = tuple(toe_links)
        self.config = config
        self.leg_qd = leg_structure(model, self.toe_links)
        self.hip_positions = hip_positions_base_frame(model, self.toe_links)
        self.num_legs = len(self.toe_links)

    # -- state ------------------------------------------------------------
    def init_state(self, q, dtype=None) -> LocomotionMpcState:
        dtype = dtype or q.dtype
        feet = self._feet_base(q)
        return LocomotionMpcState(
            time=jnp.zeros((), dtype),
            swing=SwingLegState(
                last_leg_state=self.config.gait.initial_leg_state,
                phase_switch_foot_position=feet,
            ),
            vel_filter=VelocityFilterState.create(
                window=self.config.velocity_filter_window, dtype=dtype
            ),
        )

    # -- frame helpers (fixed-base xyz_xyzrot emulation layout) ----------
    def _base_pose(self, q):
        pos = q[..., 0:3]
        rot = rotation.from_rpy(q[..., 3], q[..., 4], q[..., 5])
        return pos, rot

    def _feet_world(self, q):
        _, lxw, _ = forward_kinematics_q(self.model, q)
        return jnp.stack([lxw[l].pos for l in self.toe_links], axis=-2)

    def _feet_base(self, q):
        pos, rot = self._base_pose(q)
        feet_w = self._feet_world(q)
        return jnp.einsum("...ji,...kj->...ki", rot, feet_w - pos[..., None, :])

    # -- per-leg IK (3x3 damped Gauss-Newton, legs solved jointly) -------
    def _legs_ik(self, q, targets_world):
        dtype = q.dtype
        lam2 = jnp.asarray(self.config.ik_damping**2, dtype)
        from tds_tpu.algebra.linalg import inv3

        def body(q, _):
            base_x, lxw, lxb = forward_kinematics_q(self.model, q)
            for leg, toe in enumerate(self.toe_links):
                foot = lxw[toe].pos
                e = targets_world[..., leg, :] - foot
                # reuse this iteration's FK pass; point_jacobian(model, q,
                # ...) would rerun a whole-robot FK per leg (4x redundant)
                jac_full = point_jacobian_kin(
                    self.model, base_x, lxw, lxb, toe, foot,
                    batch=q.shape[:-1], dtype=dtype,
                )
                jac = jnp.stack(
                    [jac_full[..., :, j] for j in self.leg_qd[leg]], axis=-1
                )  # (…, 3, 3)
                jt = jnp.swapaxes(jac, -1, -2)
                a = jt @ jac + lam2 * jnp.eye(3, dtype=dtype)
                dq = jnp.einsum(
                    "...ij,...j->...i", inv3(a), jnp.einsum("...ij,...j->...i", jt, e)
                )
                for k, j in enumerate(self.leg_qd[leg]):
                    # q index == qd index for the fixed-base layout
                    q = q.at[..., j].add(dq[..., k])
            return q, None

        q_sol, _ = jax.lax.scan(body, q, None, length=self.config.ik_iterations)
        return q_sol

    # -- main update ------------------------------------------------------
    def update(self, state: LocomotionMpcState, q, qd):
        """One control tick: returns (state', tau_actuated (12,))."""
        cfg = self.config
        dtype = q.dtype
        pos, rot = self._base_pose(q)
        rpy = q[..., 3:6]
        lin_vel_world = qd[..., 0:3]
        ang_vel = qd[..., 3:6]
        yaw_rate = ang_vel[..., 2]

        feet_world = self._feet_world(q)
        feet_com_world = feet_world - pos[..., None, :]  # world-frame offsets
        feet_base = jnp.einsum("...ji,...kj->...ki", rot, feet_com_world)
        contacts = feet_world[..., 2] < cfg.contact_height_threshold

        gait = gait_update(cfg.gait, state.time, contacts)
        vel_filter, com_vel_world = state.vel_filter.update(lin_vel_world)
        com_vel_body = jnp.einsum("...ji,...j->...i", rot, com_vel_world)

        swing = swing_leg_update(state.swing, gait.desired_leg_state, feet_base)
        targets_base = raibert_foot_targets(
            com_vel_body,
            yaw_rate,
            self.hip_positions.astype(dtype),
            cfg.gait.stance_duration,
            jnp.asarray(cfg.desired_speed, dtype),
            cfg.desired_twisting_speed,
            cfg.desired_height - cfg.foot_clearance,
        )
        swing_pos_base = swing_foot_positions(
            swing, gait.normalized_phase, targets_base
        )
        swing_pos_world = (
            jnp.einsum("...ij,...kj->...ki", rot, swing_pos_base)
            + pos[..., None, :]
        )

        # swing legs: IK -> joint PD torques
        q_des = self._legs_ik(q, swing_pos_world)
        tau_swing_full = jnp.zeros_like(qd)
        for leg in range(self.num_legs):
            for j in self.leg_qd[leg]:
                tau_j = cfg.swing_kp * (q_des[..., j] - q[..., j]) - cfg.swing_kd * qd[..., j]
                tau_swing_full = tau_swing_full.at[..., j].set(tau_j)

        # stance legs: convex MPC ground-reaction forces -> J^T torques
        in_stance = (
            (gait.leg_state == STANCE) | (gait.leg_state == EARLY_CONTACT)
        ).astype(dtype)
        # NB: compute_contact_forces wants world-frame COM-relative foot
        # offsets (its B matrix pairs them with the world-frame inertia);
        # the base-frame positions only feed Raibert/swing.
        forces = compute_contact_forces(
            cfg.mpc,
            com_position=pos,
            com_velocity=com_vel_world,
            com_rpy=rpy,
            com_angular_velocity=ang_vel,
            foot_contact_states=in_stance,
            foot_positions_body=feet_com_world,
            desired_com_position=jnp.asarray([0.0, 0.0, cfg.desired_height], dtype),
            desired_com_velocity=jnp.asarray(cfg.desired_speed, dtype),
            desired_com_rpy=jnp.zeros(3, dtype),
            desired_com_angular_velocity=jnp.asarray(
                [0.0, 0.0, cfg.desired_twisting_speed], dtype
            ),
        )
        tau_stance_full = stance_torques_from_forces(
            self.model, q, self.toe_links, feet_world, forces,
            contact_mask=in_stance,
        )

        # hybrid per-leg combination on the DESIRED state (reference
        # raibert_swing_leg_controller.py:208-216)
        tau_full = jnp.zeros_like(qd)
        for leg in range(self.num_legs):
            use_swing = (gait.desired_leg_state[leg] == SWING).astype(dtype)
            for j in self.leg_qd[leg]:
                tau_full = tau_full.at[..., j].set(
                    use_swing * tau_swing_full[..., j]
                    + (1.0 - use_swing) * tau_stance_full[..., j]
                )
        tau_full = jnp.clip(tau_full, -cfg.max_torque, cfg.max_torque)

        new_state = LocomotionMpcState(
            time=state.time + self.config.control_dt,
            swing=swing,
            vel_filter=vel_filter,
        )
        return new_state, tau_full[..., 6:]


def make_walk_step(
    env, controller: LocomotionMpcController, control_every: int = 5
):
    """Returns a jitted function ((ctrl_state, q, qd)) -> (ctrl_state', q, qd)
    advancing `control_every` physics substeps per control tick — the sim
    loop of laikago_tds_mpc.cpp with MPC at 1/control_every of the physics
    rate."""
    model = env.model
    tick_dt = float(env.dt) * control_every
    if abs(tick_dt - controller.config.control_dt) > 1e-12:
        controller.config = controller.config._replace(control_dt=tick_dt)

    def tick(carry):
        ctrl, q, qd = carry
        ctrl, tau = controller.update(ctrl, q, qd)

        def sub(carry2, _):
            q, qd = carry2
            from tds_tpu.dynamics.forward_dynamics import (
                aba_factor,
                forward_dynamics_from_kin,
            )
            from tds_tpu.dynamics.integrator import integrate_euler_qdd, integrate_q
            from tds_tpu.dynamics.kinematics import fk_links
            from tds_tpu.world import resolve_contacts

            full_tau = jnp.zeros(model.dof_actuated, q.dtype).at[6:].set(tau)
            kin = fk_links(model, q, qd)
            factor = aba_factor(model, kin)
            qdd = forward_dynamics_from_kin(
                model, kin, q, qd, full_tau, env.gravity, factor=factor
            )
            qd2 = integrate_euler_qdd(model, q, qd, qdd, env.dt)
            zero = jnp.zeros(0, q.dtype)
            qds = resolve_contacts(
                env.world, (zero, q), (zero, qd2), env.dt,
                kins=[None, kin], factors=[None, factor],
            )
            q2, qd3 = integrate_q(model, q, qds[1], env.dt)
            return (q2, qd3), None

        (q, qd), _ = jax.lax.scan(sub, (q, qd), None, length=control_every)
        return ctrl, q, qd

    return jax.jit(tick)
