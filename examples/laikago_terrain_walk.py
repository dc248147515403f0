#!/usr/bin/env python
"""Laikago walking over a bumpy triangle-mesh terrain (beyond reference:
TDS locomotion worlds are infinite planes, world.hpp:29-68).

Generates a sinusoidal heightfield (utils/terrain.py), collides each toe
sphere against it with the triangle-accurate closest-point narrowphase
(collision/narrowphase.py sphere_mesh), and replays the committed
flat-ground ARS policy ZERO-SHOT on the bumps. At commit time: 1.79 m in
1.5 s, upright throughout (flat-ground gait is ~1.6 m/s).

Run: PYTHONPATH=.:/root/.axon_site python examples/laikago_terrain_walk.py
     [bump_height_m]   (JAX_PLATFORMS=cpu to force host execution)
"""

import math
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    bump = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02

    from tds_tpu.envs.laikago import LaikagoEnv
    from tds_tpu.learn.nn import linear_policy
    from tds_tpu.learn.running_stat import RunningStat
    from tds_tpu.model.geometry import Mesh
    from tds_tpu.utils.checkpoint import load_checkpoint
    from tds_tpu.utils.terrain import write_heightfield

    path = write_heightfield(
        os.path.join(tempfile.gettempdir(), "laikago_terrain.obj"),
        13, 7, (-1.0, 5.0), (-1.5, 1.5),
        lambda x, y: bump * math.sin(math.pi * x) * math.cos(math.pi * y),
    )
    terrain = Mesh(file_name=path, max_contacts=3)
    print(f"terrain: 13x7 heightfield, +-{bump*100:.0f} cm bumps -> {path}")

    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "logs", "laikago_ars", "policy_r2b.pkl",
    )
    saved, _ = load_checkpoint(ckpt)
    params = jnp.asarray(saved["params"], jnp.float32)
    obs_stat = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), saved["obs_stat"]
    )
    if not isinstance(obs_stat, RunningStat):
        obs_stat = RunningStat(*obs_stat)

    env = LaikagoEnv(dtype=jnp.float32, terrain=terrain)
    policy = linear_policy(env.observation_dim, env.action_dim)

    @jax.jit
    def rollout(key):
        st, obs = env.reset(key)

        def step(carry, _):
            st, obs, alive = carry
            action = env.action_transform(
                policy.apply(params, obs_stat.normalize(obs))
            )
            st2, obs2, _, done = env.step(st, action)
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (st2, obs2, alive), (st2.q[..., 0], st2.q[..., 2])

        (st, obs, alive), (xs, zs) = jax.lax.scan(
            step, (st, obs, 1.0), None, length=1500
        )
        return st.q, alive, xs, zs

    t0 = time.time()
    q, alive, xs, zs = jax.block_until_ready(rollout(jax.random.PRNGKey(0)))
    dt = time.time() - t0
    q, xs, zs = np.asarray(q), np.asarray(xs), np.asarray(zs)
    print(f"1500 steps in {dt:.1f}s (compile included)")
    for i in range(0, 1500, 300):
        print(f"  t={i/1000:.1f}s  x={xs[i]:+.3f} m  z={zs[i]:.3f} m")
    status = "UPRIGHT" if float(alive) == 1.0 else "FELL"
    print(f"final: x={q[0]:.3f} m in 1.5 s, z={q[2]:.3f} m — {status}")


if __name__ == "__main__":
    main()
