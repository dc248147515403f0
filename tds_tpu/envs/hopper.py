"""Hopper and half-cheetah planar locomotion envs.

Built on the reference's planar URDFs (data/hopper_link0_1.urdf,
data/cheetah_link0_1.urdf: x/z prismatic + y revolute passive base chain,
capsule collision bodies; the zero configuration stands at the URDF rest
height). Rewards follow the gym convention: forward velocity plus a
survival bonus, termination on torso height/orientation.
"""

import jax.numpy as jnp

from tds_tpu.envs.locomotion import LocomotionEnv
from tds_tpu.urdf.cache import construct


class HopperEnv(LocomotionEnv):
    TORSO_REST_Z = 1.05  # torso capsule center at q = 0 (FK of the URDF)

    def __init__(self, urdf: str = "hopper_link0_1.urdf", dtype=None, **kwargs):
        model, geoms = construct(urdf, is_floating=False, dtype=dtype)
        n_act = sum(
            1 for i, jt in enumerate(model.joint_types) if jt != -1 and i >= 3
        )
        defaults = dict(
            initial_poses=(0.0,) * n_act,
            kp=50.0,
            kd=1.0,
            max_force=30.0,
            dt=2e-3,
            start_base_position=(0.0, 0.0, 0.0),  # URDF rest pose stands
            skip_links=3,  # x, z prismatic + y revolute passive base
        )
        defaults.update(kwargs)
        super().__init__(model, geoms, **defaults)

    def reward_done(self, q_prev, qd_prev, q, qd):
        # q layout: [x, z, pitch, joints...]
        vel_x = (q[..., 0] - q_prev[..., 0]) / self.dt
        height = q[..., 1] + self.TORSO_REST_Z
        pitch = q[..., 2]
        done = (height < 0.7) | (jnp.abs(pitch) > 1.0)
        reward = jnp.where(done, 0.0, vel_x + 1.0)
        return reward, done


class HalfCheetahEnv(LocomotionEnv):
    TORSO_REST_Z = 0.7

    def __init__(self, urdf: str = "cheetah_link0_1.urdf", dtype=None, **kwargs):
        model, geoms = construct(urdf, is_floating=False, dtype=dtype)
        n_act = sum(
            1 for i, jt in enumerate(model.joint_types) if jt != -1 and i >= 3
        )
        defaults = dict(
            initial_poses=(0.0,) * n_act,
            kp=60.0,
            kd=1.5,
            max_force=60.0,
            dt=2e-3,
            start_base_position=(0.0, 0.0, 0.0),
            skip_links=3,
        )
        defaults.update(kwargs)
        super().__init__(model, geoms, **defaults)

    def reward_done(self, q_prev, qd_prev, q, qd):
        vel_x = (q[..., 0] - q_prev[..., 0]) / self.dt
        height = q[..., 1] + self.TORSO_REST_Z
        done = height < 0.3
        reward = jnp.where(done, 0.0, vel_x)
        return reward, done
