#!/usr/bin/env python
"""Load a trained ARS laikago policy and replay it (eval_laikago_env.cpp
analog: loads the saved weights + obs-filter stats, runs deterministic
rollouts, prints per-rollout reward and the base trajectory).

Run: PYTHONPATH=. python examples/laikago_ars_eval.py \
    --checkpoint ./logs/laikago_ars/policy_r2b.pkl [--steps 3000] [--render]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="./logs/laikago_ars/policy_r2b.pkl")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--rollouts", type=int, default=4)
    ap.add_argument("--render", action="store_true",
                    help="write a PNG strip via the software renderer")
    args = ap.parse_args()

    from tds_tpu.envs.laikago import LaikagoEnv
    from tds_tpu.learn.nn import linear_policy
    from tds_tpu.learn.running_stat import RunningStat
    from tds_tpu.utils.checkpoint import load_checkpoint

    state, meta = load_checkpoint(args.checkpoint)
    params = jnp.asarray(state["params"])
    obs_stat = jax.tree_util.tree_map(jnp.asarray, state["obs_stat"])
    if not isinstance(obs_stat, RunningStat):
        obs_stat = RunningStat(*obs_stat)
    print(f"loaded {args.checkpoint} (iteration {meta.get('iteration')}), "
          f"{params.shape[0]} parameters")

    env = LaikagoEnv(dtype=jnp.float32)
    policy = linear_policy(env.observation_dim, env.action_dim)

    @jax.jit
    def rollout(key):
        st, obs = env.reset(key)

        def step(carry, _):
            st, obs, total, alive = carry
            action = env.action_transform(
                policy.apply(params, obs_stat.normalize(obs))
            )
            st, obs, reward, done = env.step(st, action)
            total = total + reward * alive
            alive = alive * (1.0 - done.astype(obs.dtype))
            return (st, obs, total, alive), st.q

        (st, obs, total, alive), qs = jax.lax.scan(
            step, (st, obs, jnp.zeros((), obs.dtype), jnp.ones((), obs.dtype)),
            None, length=args.steps,
        )
        return total, qs

    for i in range(args.rollouts):
        total, qs = rollout(jax.random.PRNGKey(100 + i))
        x = np.asarray(qs[:, 0])
        z = np.asarray(qs[:, 2])
        print(
            f"rollout {i}: reward={float(total):9.2f} "
            f"final_x={x[-1]:+.3f} m  z range [{z.min():.3f}, {z.max():.3f}]"
        )

    if args.render:
        import os

        from tds_tpu.urdf.cache import load_document
        from tds_tpu.utils.file_utils import find_file
        from tds_tpu.visualizer.renderer import (
            Camera,
            Instance,
            plane_mesh,
            render_scene,
            save_png,
            scene_instances_from_urdf,
        )

        _, qs = rollout(jax.random.PRNGKey(100))
        urdf_name = "laikago/laikago_toes_zup_xyz_xyzrot.urdf"
        urdf = load_document(urdf_name)
        urdf_dir = os.path.dirname(find_file(urdf_name))
        for k, t in enumerate(np.linspace(0, args.steps - 1, 4).astype(int)):
            q = np.asarray(qs[t])
            instances = scene_instances_from_urdf(urdf, env.model, q, urdf_dir)
            pv, pf = plane_mesh()
            instances.append(
                Instance(pv, pf, np.zeros(3), np.eye(3), (0.5, 0.5, 0.55))
            )
            cam = Camera.look_at(
                eye=(q[0] + 1.4, -1.2, 0.9), target=(q[0], 0.0, 0.3),
                width=480, height=360,
            )
            save_png(render_scene(cam, instances), f"laikago_eval_{k}.png")
        print("wrote laikago_eval_{0..3}.png")


if __name__ == "__main__":
    main()
