"""Laikago quadruped locomotion env (examples/environments/laikago_environment2.h)."""

import jax.numpy as jnp

from tds_tpu.envs.locomotion import LocomotionEnv
from tds_tpu.urdf.cache import construct

LAIKAGO_INITIAL_POSES = (0.2, 0.0, -0.7) * 4  # abduction, hip, knee x 4 legs


class LaikagoEnv(LocomotionEnv):
    """Defaults from laikago_environment2.h:36-61: kp=100, kd=2,
    max_force=50, dt=1e-3, start z=0.48; reward = base x position, done when
    up.z < 0.6 or z < 0.2 (:130-171)."""

    def __init__(
        self,
        urdf: str = "laikago/laikago_toes_zup_xyz_xyzrot.urdf",
        is_floating: bool = False,
        dtype=None,
        **kwargs,
    ):
        model, geoms = construct(urdf, is_floating=is_floating, dtype=dtype)
        defaults = dict(
            initial_poses=LAIKAGO_INITIAL_POSES,
            kp=100.0,
            kd=2.0,
            max_force=50.0,
            dt=1e-3,
            start_base_position=(0.0, 0.0, 0.48),
        )
        if kwargs.get("terrain") is not None and "solver" not in kwargs:
            # terrain multiplies candidates (4 toes x max_contacts cells vs
            # 4 on the flat plane) but at most ~2 cells per toe can
            # penetrate at once: compact to the 8 deepest (float-identical
            # on driven rollouts, max |dq| 6e-7 over 300 steps, round 5)
            from tds_tpu.contact.mlcp import ContactSolverParams

            defaults["solver"] = ContactSolverParams(top_k=8)
        defaults.update(kwargs)
        super().__init__(model, geoms, **defaults)

    def reward_done(self, q_prev, qd_prev, q, qd):
        pos, up = self.base_pose_xyz_rpy(q)
        done = jnp.logical_or(up < 0.6, pos[..., 2] < 0.2)
        reward = jnp.where(done, 0.0, pos[..., 0])
        return reward, done
