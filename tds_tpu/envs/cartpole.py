"""Cartpole swing-up/balance env (examples/environments/cartpole_environment2.h).

No contact: pure ABA + Euler at dt = 1/60, gravity (0,0,-10); the cartpole
URDF hangs the rail at z=1 (base_X_world translation unit z, :55). Action is
the cart force clipped to +-10 (:170-181, :288-291); reward 1 per step; done
when |x| > 0.4 or |theta| > 12 deg (:300-306); reset uniform +-0.05 on all
states (:183-189).
"""

import jax
import jax.numpy as jnp

from tds_tpu.algebra.update import set_index

from tds_tpu.dynamics.forward_dynamics import forward_dynamics
from tds_tpu.dynamics.integrator import integrate_euler
from tds_tpu.envs.base import Env, EnvState
from tds_tpu.urdf.cache import construct

THETA_THRESHOLD = 12.0 * 2.0 * jnp.pi / 360.0
X_THRESHOLD = 0.4


class CartpoleEnv(Env):
    observation_dim = 4
    action_dim = 1

    def __init__(self, urdf: str = "cartpole.urdf", dtype=None):
        model, _ = construct(urdf, is_floating=False, dtype=dtype)
        # rail hangs at z = 1 (cartpole_environment2.h:55); dynamics are
        # invariant to this fixed-base offset
        self.model = model.replace(base_pos=jnp.asarray([0.0, 0.0, 1.0]))
        self.dt = 1.0 / 60.0
        self.gravity = jnp.asarray([0.0, 0.0, -10.0])
        self.action_low = -10.0
        self.action_high = 10.0

    def action_transform(self, raw_action):
        """clip [-1, 1] then scale to [low, high] (cartpole_environment2.h:305-321)."""
        a = jnp.clip(raw_action, -1.0, 1.0)
        return a * (self.action_high - self.action_low) / 2.0 + (
            self.action_low + self.action_high
        ) / 2.0

    def sim_step(self, q, qd, action):
        force = jnp.clip(action, self.action_low, self.action_high)
        tau = jnp.zeros(q.shape[:-1] + (self.model.dof_actuated,), q.dtype)
        tau = set_index(
            tau, 0, force[..., 0] if force.ndim == q.ndim else force
        )
        qdd = forward_dynamics(self.model, q, qd, tau, self.gravity)
        return integrate_euler(self.model, q, qd, qdd, self.dt)

    def observation(self, q, qd):
        return jnp.concatenate([q, qd], axis=-1)

    def reset(self, key):
        key, sub = jax.random.split(key)
        x = jax.random.uniform(sub, (4,), minval=-0.05, maxval=0.05)
        q, qd = x[0:2], x[2:4]
        state = EnvState(q=q, qd=qd, t=jnp.zeros((), jnp.int32), key=key)
        return state, self.observation(q, qd)

    def step(self, state: EnvState, action):
        q, qd = self.sim_step(state.q, state.qd, jnp.asarray(action))
        x = q[..., 0]
        theta = q[..., 1]
        done = (
            (x < -X_THRESHOLD)
            | (x > X_THRESHOLD)
            | (theta < -THETA_THRESHOLD)
            | (theta > THETA_THRESHOLD)
        )
        reward = jnp.ones_like(x)
        new_state = EnvState(q=q, qd=qd, t=state.t + 1, key=state.key)
        return new_state, self.observation(q, qd), reward, done
