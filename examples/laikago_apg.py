#!/usr/bin/env python
"""Gradient-based locomotion learning THROUGH hard contact: laikago + APG.

`jax.grad` flows through the full articulated pipeline — PD actuation, ABA,
the MLCP/PGS contact solve, quaternion-free integration — over a
`lax.scan` rollout, and Adam ascends forward velocity directly. With
truncated BPTT (cuts every 10 steps) the contact-chain gradients stay
tame; 80 iterations (~10 s of post-compile CPU time, seconds on TPU) teach
a standing laikago to creep forward upright (~0.4 m/s, up_z >= 0.95).

This is the capability the reference's differentiable core exists for but
never demonstrates as learning: its gradient tests stop at sys-id
(test_codegen.cpp:169-206) and its trainers are zeroth-order (ARS).
Contrast examples/laikago_ars_train.py: ARS needs thousands of rollouts to
reach a gait; APG gets directional progress from FOUR rollouts per step.

Scaling up (horizon=100, truncation=20, 400 iterations, ~6 min CPU)
reaches 0.87 m/s sustained over a full 1000-step upright eval
(up_z >= 0.84); that checkpoint is committed as
logs/laikago_apg/policy_h100.pkl.

Run: PYTHONPATH=. python examples/laikago_apg.py
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tds_tpu.envs.laikago import LaikagoEnv
from tds_tpu.learn.apg import APGConfig, init_apg, make_apg_train_step
from tds_tpu.learn.nn import Activation, MLPSpec


def main():
    env = LaikagoEnv(dtype=jnp.float32)
    policy = MLPSpec(
        env.observation_dim,
        [32, env.action_dim],
        [Activation.TANH, Activation.TANH],
    )

    def forward_reward(q, qd, a):
        # smooth: forward base velocity (qd[0] on the xyz_xyzrot base)
        # + uprightness - control effort
        _, up = env.base_pose_xyz_rpy(q)
        return qd[0] + 0.5 * up - 1e-3 * jnp.sum(a**2)

    cfg = APGConfig(horizon=50, batch=4, learning_rate=5e-3, truncation=10)
    state, opt = init_apg(env, policy, jax.random.PRNGKey(0), cfg)
    train = jax.jit(
        make_apg_train_step(env, policy, cfg, reward_fn=forward_reward, opt=opt)
    )

    t0 = time.time()
    for it in range(80):
        state, metrics = train(state)
        if (it + 1) % 10 == 0:
            print(
                f"iter {it + 1:3d}  return {float(metrics['mean_return']):8.3f}"
                f"  |g| {float(metrics['grad_norm']):8.3g}"
                f"  t={time.time() - t0:5.0f}s"
            )

    # replay the trained policy on the real env
    st, obs = env.reset(jax.random.PRNGKey(5))
    x0 = float(st.q[0])
    up_min = 1.0
    for i in range(300):
        st, obs, _, done = env.step(st, policy.apply(state.params, obs))
        _, up = env.base_pose_xyz_rpy(st.q)
        up_min = min(up_min, float(up))
        if bool(done):
            break
    print(
        f"eval: {i + 1} steps, moved {float(st.q[0]) - x0:+.3f} m forward, "
        f"up_min {up_min:.2f}"
    )


if __name__ == "__main__":
    main()
