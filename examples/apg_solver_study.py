#!/usr/bin/env python
"""APG solver study: hard (MLCP) vs smooth (spring) contact gradients on
the SAME policy task (SURVEY hard-part #6; VERDICT round-3 demand #5).

Two questions the reference raises but never answers empirically:

1. Trainability: the reference exposes a smooth spring contact model
   (pytinydiffsim.inl:825-856) explicitly motivated by gradient quality,
   and a hard MLCP solver. Which trains a better policy by analytic policy
   gradients (APG), judged on the HARD dynamics both deploy to?
   Here: train laikago APG once per solver with identical hyperparameters,
   then eval BOTH policies on the MLCP env (full 1000-step upright eval).

2. Gradient character: at matched policy parameters, how do the two
   solvers' policy gradients compare as the BPTT horizon grows — norm
   growth (contact-chain explosion) and direction agreement (cosine)?

Outputs a markdown table + JSON in logs/apg_study/. Scale knobs let the
same script smoke on CPU (--iters 5 --horizon 25) and run full on TPU.

Run (TPU): PYTHONPATH=.:/root/.axon_site python examples/apg_solver_study.py
"""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

from tds_tpu.envs.laikago import LaikagoEnv
from tds_tpu.learn.apg import APGConfig, init_apg, make_apg_train_step
from tds_tpu.learn.nn import Activation, MLPSpec


@dataclasses.dataclass
class Cfg:
    horizon: int = 250
    truncation: int = 25
    batch: int = 16
    iters: int = 400
    learning_rate: float = 5e-3
    eval_length: int = 1000
    grad_horizons: str = "25,50,100,200"  # full-BPTT gradient probe lengths
    out: str = "./logs/apg_study/study.json"
    seed: int = 0


def forward_reward(env):
    def r(q, qd, a):
        _, up = env.base_pose_xyz_rpy(q)
        return qd[0] + 0.5 * up - 1e-3 * jnp.sum(a**2)

    return r


def make_policy(env):
    return MLPSpec(
        env.observation_dim,
        [32, env.action_dim],
        [Activation.TANH, Activation.TANH],
    )


def eval_on_mlcp(env, policy, params, length):
    """Deterministic rollout on the HARD env: distance, velocity, upright."""

    @jax.jit
    def run(params):
        st, obs = env.reset(jax.random.PRNGKey(5))
        x0 = st.q[0]

        def body(carry, _):
            st, obs, alive, steps, x = carry
            st, obs, _, done = env.step(st, policy.apply(params, obs))
            steps = steps + alive
            x = jnp.where(alive > 0, st.q[0], x)
            alive = alive * (1.0 - done.astype(obs.dtype))
            return (st, obs, alive, steps, x), None

        one = jnp.ones((), jnp.float32)
        (st, obs, alive, steps, x), _ = jax.lax.scan(
            body, (st, obs, one, jnp.zeros((), jnp.float32), x0),
            None, length=length,
        )
        return x - x0, steps

    dist, steps = run(params)
    steps = max(float(steps), 1.0)
    return {
        "distance_m": float(dist),
        "steps_alive": steps,
        "velocity_mps": float(dist) / (steps * float(env.dt)),
    }


def rollout_return_fn(env, policy, horizon, batch):
    """Mean return over `horizon` with FULL backprop (the gradient probe)."""
    reward = forward_reward(env)

    def ret(params, key):
        keys = jax.random.split(key, batch)
        states, _ = jax.vmap(env.reset)(keys)

        def step(carry, _):
            q, qd = carry
            obs = env.observation(q, qd)
            action = env.action_transform(
                jax.vmap(policy.apply, in_axes=(None, 0))(params, obs)
            )
            q2, qd2 = jax.vmap(env.sim_step)(q, qd, action)
            return (q2, qd2), jax.vmap(reward)(q2, qd2, action)

        (_, _), rewards = jax.lax.scan(
            jax.checkpoint(step), (states.q, states.qd), None, length=horizon
        )
        return jnp.mean(jnp.sum(rewards, axis=0))

    return ret


def main():
    from tds_tpu.utils.experiment import Experiment

    exp = Experiment("apg_study", Cfg())
    cfg = exp.parse_args()
    exp.start()

    env = {
        "mlcp": LaikagoEnv(dtype=jnp.float32),
        "spring": LaikagoEnv(dtype=jnp.float32, contact_model="spring"),
    }
    policy = make_policy(env["mlcp"])
    apg_cfg = APGConfig(
        horizon=cfg.horizon,
        batch=cfg.batch,
        learning_rate=cfg.learning_rate,
        truncation=cfg.truncation,
    )

    results = {}
    trained = {}
    for name in ("mlcp", "spring"):
        state, opt = init_apg(env[name], policy, jax.random.PRNGKey(cfg.seed), apg_cfg)
        train = jax.jit(
            make_apg_train_step(
                env[name], policy, apg_cfg,
                reward_fn=forward_reward(env[name]), opt=opt,
            )
        )
        state, _ = train(state)  # compile + first step
        t0 = time.time()
        for it in range(1, cfg.iters):
            state, metrics = train(state)
            if (it + 1) % max(cfg.iters // 8, 1) == 0:
                print(
                    f"[{name}] iter {it + 1:4d}"
                    f"  return {float(metrics['mean_return']):8.3f}"
                    f"  |g| {float(metrics['grad_norm']):8.3g}"
                )
        jax.block_until_ready(state.params)
        wall = time.time() - t0
        trained[name] = state.params
        ev = eval_on_mlcp(env["mlcp"], policy, state.params, cfg.eval_length)
        results[name] = {
            "train_solver": name,
            "eval_solver": "mlcp",
            **ev,
            "rollouts": cfg.iters * cfg.batch,
            "env_steps": cfg.iters * cfg.batch * cfg.horizon,
            "wall_s_post_compile": round(wall, 1),
        }
        print(f"[{name}] eval on MLCP: {results[name]}")

    # -- gradient character at matched params (full BPTT, no truncation) ---
    probe_params = trained["mlcp"]
    key = jax.random.PRNGKey(17)
    grad_rows = []
    for h in [int(s) for s in cfg.grad_horizons.split(",") if s]:
        gs = {}
        for name in ("mlcp", "spring"):
            g = jax.jit(jax.grad(rollout_return_fn(env[name], policy, h, cfg.batch)))(
                probe_params, key
            )
            gs[name] = jnp.concatenate(
                [x.ravel() for x in jax.tree_util.tree_leaves(g)]
            )
        nm, ns = float(jnp.linalg.norm(gs["mlcp"])), float(jnp.linalg.norm(gs["spring"]))
        cos = float(jnp.dot(gs["mlcp"], gs["spring"]) / (nm * ns + 1e-30))
        grad_rows.append(
            {"horizon": h, "norm_mlcp": nm, "norm_spring": ns, "cosine": cos}
        )
        print(f"[grad] T={h:4d}  |g_mlcp|={nm:10.3g}  |g_spring|={ns:10.3g}"
              f"  cos={cos:+.3f}")

    out = {"train_eval": results, "gradient_probe": grad_rows,
           "config": dataclasses.asdict(cfg)}
    os.makedirs(os.path.dirname(cfg.out), exist_ok=True)
    with open(cfg.out, "w") as f:
        json.dump(out, f, indent=1)

    print("\n| train solver | eval dist (m) | vel (m/s) | steps alive "
          "| rollouts | wall (s) |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['distance_m']:.2f} | {r['velocity_mps']:.2f} "
            f"| {r['steps_alive']:.0f} | {r['rollouts']} "
            f"| {r['wall_s_post_compile']} |"
        )
    exp.finish()


if __name__ == "__main__":
    main()
