"""Two-link reacher env (examples/environments/reacher_environment.h).

Fixed-base 2R arm in the horizontal plane reaching a target point; reward
is negative distance from fingertip to target minus an action penalty; no
contact. Observation: [cos q, sin q, qd, target, fingertip - target].
"""

import jax
import jax.numpy as jnp

from tds_tpu.dynamics.forward_dynamics import forward_dynamics
from tds_tpu.dynamics.integrator import integrate_euler
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.envs.base import Env, EnvState
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyBuilder


def _reacher_model(l1=0.1, l2=0.11, dtype=None):
    b = MultiBodyBuilder(name="reacher")
    b.add_link(
        JointType.REVOLUTE_Z, -1, mass=0.1, com=(l1 / 2, 0, 0),
        inertia_about_com=(1e-4, 1e-4, 1e-4), link_name="link0",
    )
    b.add_link(
        JointType.REVOLUTE_Z, 0, x_t_pos=(l1, 0, 0), mass=0.1,
        com=(l2 / 2, 0, 0), inertia_about_com=(1e-4, 1e-4, 1e-4),
        link_name="link1",
    )
    return b.finalize(dtype=dtype)


class ReacherEnv(Env):
    observation_dim = 10
    action_dim = 2

    def __init__(self, dtype=None, dt: float = 0.02, episode_length: int = 50):
        self.model = _reacher_model(dtype=dtype)
        self.l_tip = 0.11
        self.dt = dt
        self.episode_length = episode_length
        self.gravity = jnp.zeros(3)  # horizontal plane
        self.torque_scale = 0.05

    def fingertip(self, q):
        _, lxw, _ = forward_kinematics_q(self.model, q)
        tip_local = jnp.asarray([self.l_tip, 0.0, 0.0], q.dtype)
        return lxw[1].apply_point(tip_local)[..., 0:2]

    def observation(self, q, qd, target):
        tip = self.fingertip(q)
        return jnp.concatenate(
            [jnp.cos(q), jnp.sin(q), qd, target, tip - target], axis=-1
        )

    def reset(self, key):
        key, k1, k2, k3 = jax.random.split(key, 4)
        q = jax.random.uniform(k1, (2,), minval=-3.1, maxval=3.1)
        qd = jax.random.uniform(k2, (2,), minval=-0.005, maxval=0.005)
        # target inside the reachable disc
        target = jax.random.uniform(k3, (2,), minval=-0.18, maxval=0.18)
        state = EnvState(
            q=jnp.concatenate([q, target]),  # target rides in q tail
            qd=qd,
            t=jnp.zeros((), jnp.int32),
            key=key,
        )
        return state, self.observation(q, qd, target)

    def step(self, state: EnvState, action):
        q, target = state.q[0:2], state.q[2:4]
        qd = state.qd
        tau = self.torque_scale * jnp.clip(jnp.asarray(action), -1.0, 1.0)
        qdd = forward_dynamics(self.model, q, qd, tau, self.gravity)
        q, qd = integrate_euler(self.model, q, qd, qdd, self.dt)
        tip = self.fingertip(q)
        dist = jnp.linalg.norm(tip - target, axis=-1)
        reward = -dist - jnp.sum(jnp.square(action), axis=-1)
        done = state.t + 1 >= self.episode_length
        new_state = EnvState(
            q=jnp.concatenate([q, target]), qd=qd, t=state.t + 1, key=state.key
        )
        return new_state, self.observation(q, qd, target), reward, done
