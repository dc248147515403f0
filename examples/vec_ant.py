#!/usr/bin/env python
"""Vectorized ant rollouts: vmap(env.step) over thousands of parallel envs.

The tds_tpu analog of the reference's python/examples/vec_ant.py (there: a
pybullet-backed VectorEnv stepped by a thread pool; here: one jitted,
vmapped env on the accelerator). Prints throughput and reward stats.

Run: PYTHONPATH=. python examples/vec_ant.py [batch] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from tds_tpu.envs.ant import AntEnv

    env = AntEnv(dtype=jnp.float32)

    @jax.jit
    def reset_all(key):
        return jax.vmap(env.reset)(jax.random.split(key, batch))

    @jax.jit
    def step_all(states, obs, key):
        actions = jax.random.uniform(
            key, (batch, env.action_dim), minval=-0.3, maxval=0.3,
            dtype=obs.dtype,
        )
        return jax.vmap(env.step)(states, actions)

    states, obs = reset_all(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    # warmup/compile
    states_w, obs_w, r_w, d_w = step_all(states, obs, key)
    jax.block_until_ready(obs_w)

    t0 = time.time()
    total_r = jnp.zeros((batch,), obs.dtype)
    for i in range(steps):
        key, sub = jax.random.split(key)
        states, obs, reward, done = step_all(states, obs, sub)
        total_r = total_r + reward
    jax.block_until_ready(obs)
    dt = time.time() - t0

    print(f"{batch} envs x {steps} steps on {jax.devices()[0].platform}: "
          f"{batch * steps / dt:,.0f} env-steps/s")
    print(f"mean episode reward (random policy): {float(total_r.mean()):.2f}")
    print(f"done fraction at end: {float(done.mean()):.3f}")


if __name__ == "__main__":
    main()
