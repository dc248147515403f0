#!/usr/bin/env python
"""Evaluate laikago checkpoints across terrain roughness levels.

Builds the same analytic sinusoidal heightfield family the terrain
trainer uses (examples/laikago_ars_train.py --terrain_bump) at a sweep of
bump amplitudes, rolls each checkpoint over a batch of seeds, and prints
a distance/survival table — the flat-trained vs terrain-trained
comparison demanded by the round-3 review (#4).

Run: PYTHONPATH=. python examples/laikago_terrain_eval.py \
    --checkpoints logs/laikago_ars/policy_r2b.pkl,logs/laikago_terrain/policy_b4.pkl \
    --bumps 0,0.02,0.04,0.06 --seeds 8 --length 3000
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Cfg:
    checkpoints: str = "logs/laikago_ars/policy_r2b.pkl"
    bumps: str = "0,0.02,0.04,0.06"
    seeds: int = 8
    length: int = 3000
    terrain_scan: int = 0  # must match how the checkpoint was trained
    out: str = ""


def make_env(bump: float, scan: int):
    from examples.laikago_ars_train import make_terrain_env
    from tds_tpu.envs.laikago import LaikagoEnv

    if bump <= 0.0 and scan == 0:
        return LaikagoEnv(dtype=jnp.float32)
    return make_terrain_env(max(bump, 1e-4), scan, jnp.float32)


def evaluate(env, params, obs_stat, seeds: int, length: int):
    from tds_tpu.learn.nn import linear_policy

    policy = linear_policy(env.observation_dim, env.action_dim)

    @jax.jit
    def one(key):
        st, obs = env.reset(key)
        x0 = st.q[0]

        def step(carry, _):
            st, obs, alive, steps, x = carry
            action = env.action_transform(
                policy.apply(params, obs_stat.normalize(obs))
            )
            st, obs, _, done = env.step(st, action)
            steps = steps + alive
            x = jnp.where(alive > 0, st.q[0], x)
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (st, obs, alive, steps, x), None

        one_ = jnp.ones((), jnp.float32)
        (st, obs, alive, steps, x), _ = jax.lax.scan(
            step, (st, obs, one_, jnp.zeros((), jnp.float32), x0),
            None, length=length,
        )
        return x - x0, steps

    dists, steps = jax.vmap(one)(
        jax.random.split(jax.random.PRNGKey(0), seeds)
    )
    return {
        "dist_mean_m": float(dists.mean()),
        "dist_min_m": float(dists.min()),
        "steps_mean": float(steps.mean()),
        "survived": int((steps == length).sum()),
    }


def load(path):
    from tds_tpu.learn.running_stat import RunningStat
    from tds_tpu.utils.checkpoint import load_checkpoint

    saved, _ = load_checkpoint(path)
    params = jnp.asarray(saved["params"], jnp.float32)
    obs_stat = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), saved["obs_stat"]
    )
    if not isinstance(obs_stat, RunningStat):
        obs_stat = RunningStat(*obs_stat)
    return params, obs_stat


def main():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tds_tpu.utils.experiment import Experiment

    exp = Experiment("terrain_eval", Cfg())
    cfg = exp.parse_args()

    bumps = [float(b) for b in cfg.bumps.split(",") if b != ""]
    ckpts = [c for c in cfg.checkpoints.split(",") if c]
    rows = []
    header = "| checkpoint | " + " | ".join(
        f"±{b * 100:.0f} cm" for b in bumps
    ) + " |"
    print(header)
    print("|---" * (len(bumps) + 1) + "|")
    for ck in ckpts:
        params, obs_stat = load(ck)
        cells = []
        for b in bumps:
            env = make_env(b, cfg.terrain_scan)
            r = evaluate(env, params, obs_stat, cfg.seeds, cfg.length)
            rows.append({"checkpoint": ck, "bump": b, **r})
            cells.append(
                f"{r['dist_mean_m']:.2f} m ({r['survived']}/{cfg.seeds} up)"
            )
            print(f"  .. {ck} ±{b*100:.0f}cm: {rows[-1]}", flush=True)
        print(f"| {os.path.basename(ck)} | " + " | ".join(cells) + " |")
    if cfg.out:
        os.makedirs(os.path.dirname(cfg.out) or ".", exist_ok=True)
        with open(cfg.out, "w") as f:
            json.dump({"rows": rows, "config": dataclasses.asdict(cfg)}, f, indent=1)


if __name__ == "__main__":
    main()
