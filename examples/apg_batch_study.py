#!/usr/bin/env python
"""APG batch-scaling study, round 5: can batch 64 beat the batch-4 APG
checkpoint once checkpoint selection is EVAL-GATED?

Round-4 finding (PROGRESS.md): scaling the winning h100 config
(horizon 100, truncation 20) from batch 4 to batch 64 converges to a
HIGHER training return whose gait falls before the 1000-step eval horizon
— batch-averaging the contact gradients finds a faster-but-unstable
optimum. Untried mitigations this script closes out (VERDICT r4 #6):

  - eval-gated harvesting: every eval_interval iters run an 8-seed
    deterministic 1000-step eval and keep the best-by-min-displacement
    policy, so the run's PATH through policy space is searched, not just
    its endpoint;
  - tighter gradient clipping (--max_grad_norm), damping the batch-64
    super-gradients directly;
  - reset diversity is already maximal (every rollout of every iteration
    uses a fresh reset key; tds_tpu/learn/apg.py splits per-batch keys).

Arms are run by invocation, e.g.
  python examples/apg_batch_study.py --batch 64 --iterations 1500
  python examples/apg_batch_study.py --batch 64 --max_grad_norm 1.0
The committed reference point is logs/laikago_apg/policy_h100.pkl
(batch 4: 0.87 m/s sustained over a full 1000-step upright eval).
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp

from tds_tpu.envs.laikago import LaikagoEnv
from tds_tpu.learn.apg import APGConfig, init_apg, make_apg_train_step
from tds_tpu.learn.nn import Activation, MLPSpec


@dataclasses.dataclass
class Cfg:
    batch: int = 64
    horizon: int = 100
    truncation: int = 20
    learning_rate: float = 5e-3
    max_grad_norm: float = 10.0
    iterations: int = 1500
    eval_interval: int = 50
    eval_length: int = 1000
    checkpoint: str = "./logs/apg_study/policy_b64.pkl"
    seed: int = 0


def make_eval(env, policy, eval_length):
    @jax.jit
    def run(params, key):
        def one(key):
            st, obs = env.reset(key)

            def body(carry, _):
                st, obs, alive, steps, x = carry
                st, obs, _r, d = env.step(st, policy.apply(params, obs))
                steps = steps + alive
                x = jnp.where(alive > 0, st.q[0], x)
                alive = alive * (1.0 - d.astype(obs.dtype))
                return (st, obs, alive, steps, x), None

            z = jnp.zeros((), jnp.float32)
            (st, obs, alive, steps, x), _ = jax.lax.scan(
                body, (st, obs, jnp.ones((), jnp.float32), z, z),
                None, length=eval_length,
            )
            return steps, x

        steps, xs = jax.vmap(one)(jax.random.split(key, 8))
        return {
            "eval_steps_mean": steps.mean(),
            "eval_x_min": xs.min(),
            "eval_x_mean": xs.mean(),
        }

    return run


def main():
    from tds_tpu.utils.checkpoint import save_checkpoint
    from tds_tpu.utils.experiment import Experiment

    exp = Experiment("apg_study", Cfg())
    cfg = exp.parse_args()
    exp.start()

    env = LaikagoEnv(dtype=jnp.float32)
    policy = MLPSpec(
        env.observation_dim,
        [32, env.action_dim],
        [Activation.TANH, Activation.TANH],
    )

    def forward_reward(q, qd, a):
        _, up = env.base_pose_xyz_rpy(q)
        return qd[0] + 0.5 * up - 1e-3 * jnp.sum(a**2)

    apg_cfg = APGConfig(
        horizon=cfg.horizon,
        batch=cfg.batch,
        learning_rate=cfg.learning_rate,
        truncation=cfg.truncation,
        max_grad_norm=cfg.max_grad_norm,
    )
    state, opt = init_apg(env, policy, jax.random.PRNGKey(cfg.seed), apg_cfg)
    train = jax.jit(
        make_apg_train_step(
            env, policy, apg_cfg, reward_fn=forward_reward, opt=opt
        )
    )
    eval_fn = make_eval(env, policy, cfg.eval_length)

    best = -float("inf")
    t0 = time.time()
    for it in range(cfg.iterations):
        state, metrics = train(state)
        if (it + 1) % cfg.eval_interval == 0:
            em = eval_fn(state.params, jax.random.PRNGKey(777 + it))
            metrics = {**metrics, **em}
            # gate on worst-seed displacement: a policy that falls scores
            # the x it reached, so survival and speed trade off honestly
            score = float(em["eval_x_min"])
            if score > best:
                best = score
                save_checkpoint(
                    cfg.checkpoint,
                    {"params": state.params},
                    metadata={"iteration": it + 1, "eval_x_min": score},
                )
            exp.log_metrics(it, {k: float(v) for k, v in metrics.items()})
            print(
                f"iter {it + 1:4d} return {float(metrics['mean_return']):8.2f} "
                f"eval_x {float(em['eval_x_mean']):+6.2f} "
                f"(min {float(em['eval_x_min']):+6.2f}) "
                f"steps {float(em['eval_steps_mean']):6.0f} "
                f"best {best:+.2f} t={time.time() - t0:5.0f}s",
                flush=True,
            )
    exp.finish()
    print(f"best eval_x_min: {best:+.3f} (batch-4 h100 reference: "
          f"0.87 m/s x {cfg.eval_length / 1000:.0f}s upright)")


if __name__ == "__main__":
    main()
