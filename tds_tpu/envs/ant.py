"""Ant locomotion env (examples/environments/ant_environment2.h)."""

import jax.numpy as jnp

from tds_tpu.contact.mlcp import ContactSolverParams
from tds_tpu.envs.locomotion import LocomotionEnv
from tds_tpu.urdf.cache import construct

ANT_INITIAL_POSES = (0.0, -0.5) * 4  # hip, knee x 4 legs


class AntEnv(LocomotionEnv):
    """Defaults from ant_environment2.h:54-67: kp=15, kd=0.3, max_force=3,
    dt=0.01, start z=0.48; reward = forward velocity, done when z < 0.26
    (:75-106).

    The solver compacts the 17 plane candidates (8 capsules x 2 endpoint
    probes + torso sphere) to the 8 deepest before MLCP assembly — a
    51-row system becomes 24 rows. Measured on driven rollouts (round 5):
    at most ~6 candidates penetrate at once, so trajectories match the
    full system to float precision (max |dq| 1.4e-6 over 300 steps) while
    the Delassus/PGS cost drops ~(51/24)^2 = 4.5x."""

    def __init__(
        self,
        urdf: str = "gym/ant_org_xyz_xyzrot.urdf",
        is_floating: bool = False,
        dtype=None,
        **kwargs,
    ):
        model, geoms = construct(urdf, is_floating=is_floating, dtype=dtype)
        defaults = dict(
            initial_poses=ANT_INITIAL_POSES,
            kp=15.0,
            kd=0.3,
            max_force=3.0,
            dt=0.01,
            start_base_position=(0.0, 0.0, 0.48),
            solver=ContactSolverParams(top_k=8),
        )
        defaults.update(kwargs)
        super().__init__(model, geoms, **defaults)

    def reward_done(self, q_prev, qd_prev, q, qd):
        pos_prev, _ = self.base_pose_xyz_rpy(q_prev)
        pos, _ = self.base_pose_xyz_rpy(q)
        vel_x = (pos[..., 0] - pos_prev[..., 0]) / self.dt
        done = pos[..., 2] < 0.26
        reward = jnp.where(done, 0.0, vel_x)
        return reward, done
