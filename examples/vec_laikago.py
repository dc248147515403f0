#!/usr/bin/env python
"""Vectorized laikago rollouts — the headline benchmark workload as a demo.

The tds_tpu analog of the reference's python/examples/vec_laikago.py.
Steps thousands of contact-enabled laikago envs with a zero policy and
prints throughput; on one TPU v5e chip this is the ~5M env-steps/s path
(bench.py measures it precisely; this example keeps it human-sized).

Run: PYTHONPATH=.:/root/.axon_site python examples/vec_laikago.py [batch] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from tds_tpu.envs.laikago import LaikagoEnv

    env = LaikagoEnv(dtype=jnp.float32)

    @jax.jit
    def step_all(q, qd):
        action = jnp.zeros(q.shape[:-1] + (env.action_dim,), q.dtype)
        return jax.vmap(env.sim_step)(q, qd, action)

    q0, qd0 = env.initial_state(jax.random.PRNGKey(0))
    q = jnp.tile(q0[None], (batch, 1))
    qd = jnp.tile(qd0[None], (batch, 1))

    t0 = time.time()
    q_w, qd_w = step_all(q, qd)
    jax.block_until_ready(q_w)
    print(f"compiled in {time.time() - t0:.1f}s on {jax.devices()[0].platform}")

    t0 = time.time()
    for _ in range(steps):
        q, qd = step_all(q, qd)
    jax.block_until_ready(q)
    dt = time.time() - t0

    z = q[:, 2]  # base height (xyz_xyzrot URDF: passive xyz chain first)
    print(f"{batch} envs x {steps} steps: {batch * steps / dt:,.0f} env-steps/s")
    print(f"base height after {steps} ms of settling: "
          f"mean={float(z.mean()):.3f} min={float(z.min()):.3f} "
          f"finite={bool(jnp.all(jnp.isfinite(q)))}")


if __name__ == "__main__":
    main()
