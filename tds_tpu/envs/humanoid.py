"""Humanoid locomotion env with spherical joints
(examples/environments/humanoid_environment.h + humanoid_xyz_spherical.h)."""

import jax.numpy as jnp

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
        **kwargs,
    ):
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
        )
        defaults.update(kwargs)
        super().__init__(model, geoms, **defaults)

    def reward_done(self, q_prev, qd_prev, q, qd):
        pos, up = self.base_pose_xyz_rpy(q)
        done = jnp.logical_or(up < 0.6, pos[..., 2] < 0.8)
        reward = jnp.where(done, 0.0, pos[..., 0])
        return reward, done
