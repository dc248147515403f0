"""Humanoid locomotion env with spherical joints
(examples/environments/humanoid_environment.h + humanoid_xyz_spherical.h)."""

import jax.numpy as jnp

from tds_tpu.contact.mlcp import ContactSolverParams
from tds_tpu.envs.locomotion import LocomotionEnv
from tds_tpu.urdf.cache import construct


class HumanoidEnv(LocomotionEnv):
    """Spherical-joint humanoid locomotion task. Defaults follow the
    reference humanoid env (humanoid_environment.h:73-78): kp=50, kd=1.5,
    max_force=50, dt=1e-3, start z=1.4; reward = torso x position while
    upright (:155-196, no alive bonus — standing still earns ~0, so the
    trainer is pushed toward forward progress); done when up.z < 0.6 or
    torso z < 0.8 (:187)."""

    def __init__(
        self,
        urdf: str = "humanoid_xyz_spherical.urdf",
        is_floating: bool = False,
        dtype=None,
        height_bonus: float = 0.0,
        crouch_penalty: float = 0.0,
        crouch_ref: float = 1.2,
        z_damping: float = 0.0,
        alive_bonus: float = 0.0,
        **kwargs,
    ):
        # Training-shaping knobs (beyond reference, default OFF = reference
        # reward). Diagnosed round 5: long-horizon gaits terminate by slowly
        # SINKING through the z<0.8 floor (up-vector still fine at the
        # fall, z hits the threshold at ~1500 steps on every probed seed)
        # — the x-position reward never penalizes a progressive crouch.
        #   height_bonus * (torso_z - 1.0): symmetric shaping; at weights
        #     strong enough to matter late-episode it also REWARDS standing
        #     tall without walking (z starts at 1.4), so it must stay weak
        #     (~1.0) and was measured too weak to move the plateau.
        #   crouch_penalty * max(crouch_ref - z, 0): penalty-ONLY shaping —
        #     punishes sinking below crouch_ref without ever paying for
        #     standing, so it can be strong (O(x-reward)) safely.
        #   z_damping * vz^2: damps the slowly-GROWING vertical oscillation
        #     the round-5 contact probe exposed (the "sink" is actually the
        #     feet LEAVING the ground — contact distances go positive while
        #     z drops; a slow vertical mode deepens each ~800-step cycle
        #     until a dip crosses the z<0.8 termination with up still ~0.9).
        # Policies trained with shaping are always EVALUATED and gated on
        # the unshaped reference reward.
        #   alive_bonus: flat per-step bonus. REQUIRED whenever the penalty
        #     terms make the expected per-step return negative: reward is 0
        #     after termination, so a net-negative stream makes dying early
        #     PROFITABLE and ARS's top-direction selection amplifies
        #     early-death gaits. Size it to keep the per-step net positive.
        self.height_bonus = float(height_bonus)
        self.crouch_penalty = float(crouch_penalty)
        self.crouch_ref = float(crouch_ref)
        self.z_damping = float(z_damping)
        self.alive_bonus = float(alive_bonus)
        model, geoms = construct(urdf, is_floating=is_floating, dtype=dtype)
        # the xyz_spherical base uses 3 prismatic + 1 spherical link
        n_base_links = 0 if is_floating else (4 if "spherical" in urdf else 6)
        # spherical joints take identity-orientation PD targets; the
        # initial_poses/action vector spans the actuated 1-DoF joints
        n_single = sum(
            1
            for i, jt in enumerate(model.joint_types)
            if jt not in (-1, 8) and i >= n_base_links
        )
        defaults = dict(
            initial_poses=(0.0,) * n_single,
            kp=50.0,
            kd=1.5,
            max_force=50.0,
            dt=1e-3,
            start_base_position=(0.0, 0.0, 1.4),
            skip_links=n_base_links,
            # 19 collision geoms (16 capsules x 2 probes + 3 spheres) give
            # 35 plane candidates = a 105-row MLCP, of which a walking gait
            # penetrates at most a handful. The 8-deepest compaction is
            # float-identical on driven rollouts (max |dq| 5.6e-6 over 300
            # steps, round-5 probe) but MEASURED SLOWER here: 240K steps/s
            # with top_k=8 vs 667K with the full 105-row system (batch 4096
            # x 200-step scan, TPU v5e, round 5) — the per-step top_k sort +
            # one-hot selection over 35 wide Jacobian rows costs more than
            # the Delassus shrink saves on this robot (contrast ant 2.12x
            # and terrain-laikago 1.53x FASTER, where candidates are few).
            # Default stays the full system; opt in via solver=... if the
            # contact set grows.
            solver=ContactSolverParams(top_k=0),
        )
        defaults.update(kwargs)
        super().__init__(model, geoms, **defaults)

    def reward_done(self, q_prev, qd_prev, q, qd):
        pos, up = self.base_pose_xyz_rpy(q)
        done = jnp.logical_or(up < 0.6, pos[..., 2] < 0.8)
        reward = pos[..., 0]
        if self.height_bonus:
            reward = reward + self.height_bonus * (pos[..., 2] - 1.0)
        if self.crouch_penalty:
            reward = reward - self.crouch_penalty * jnp.maximum(
                self.crouch_ref - pos[..., 2], 0.0
            )
        if self.z_damping:
            # base z velocity: qd[2] is the z-prismatic rate of the
            # xyz_spherical base (the same coordinate reward reads as pos z)
            reward = reward - self.z_damping * qd[..., 2] ** 2
        if self.alive_bonus:
            reward = reward + self.alive_bonus
        reward = jnp.where(done, 0.0, reward)
        return reward, done
