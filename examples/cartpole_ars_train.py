#!/usr/bin/env python
"""Train cartpole swing-balance with ARS in under a minute on CPU.

The smallest end-to-end trainer in the repo — the analog of the
reference's examples/cartpole_eval.cpp + ars training path, sized so a
laptop CPU reproduces it quickly. Prints eval reward as it learns and
exits nonzero if the policy fails to improve (so it doubles as a smoke
check).

Run: PYTHONPATH=. python examples/cartpole_ars_train.py [--iterations 30]
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Cfg:
    num_directions: int = 16
    rollout_length: int = 200
    delta_std: float = 0.1
    step_size: float = 0.1
    iterations: int = 30
    eval_interval: int = 5


def main():
    from tds_tpu.envs.cartpole import CartpoleEnv
    from tds_tpu.learn.ars import ARSConfig, init_ars, make_eval, make_train_step
    from tds_tpu.learn.nn import linear_policy
    from tds_tpu.utils.experiment import Experiment

    exp = Experiment("cartpole_ars", Cfg())
    cfg = exp.parse_args()

    env = CartpoleEnv(dtype=jnp.float32)
    policy = linear_policy(env.observation_dim, env.action_dim)
    ars_cfg = ARSConfig(
        num_directions=cfg.num_directions,
        rollout_length=cfg.rollout_length,
        delta_std=cfg.delta_std,
        step_size=cfg.step_size,
        eval_interval=cfg.eval_interval,
    )
    step_fn = make_train_step(env, policy, ars_cfg)
    eval_fn = make_eval(env, policy, ars_cfg, num_rollouts=4)
    state = init_ars(env, policy, jax.random.PRNGKey(0))

    first = last = None
    for it in range(cfg.iterations):
        state, metrics = step_fn(state)
        if it % cfg.eval_interval == 0 or it == cfg.iterations - 1:
            r = float(eval_fn(state, jax.random.PRNGKey(it))["eval_reward_mean"])
            first = r if first is None else first
            last = r
            print(f"iter {it:3d}  eval_reward_mean={r:8.2f}")

    if last <= first:
        print("policy did not improve", file=sys.stderr)
        return 1
    print(f"improved {first:.1f} -> {last:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
