#!/usr/bin/env python
"""ARS training on the laikago locomotion env (ars_train_policy analog).

Run (TPU): PYTHONPATH=.:/root/.axon_site python examples/laikago_ars_train.py \
    --num_directions 64 --rollout_length 400 --iterations 50
"""

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Cfg:
    num_directions: int = 64
    rollout_length: int = 400
    delta_std: float = 0.03
    step_size: float = 0.02
    top_directions: int = 0
    iterations: int = 50
    eval_interval: int = 10
    checkpoint: str = "./logs/laikago_ars/policy.pkl"
    resume: str = ""  # checkpoint to warm-start params/obs_stat from
    seed: int = 0  # ARS exploration + init seed (multi-seed studies)


def main():
    from tds_tpu.envs.laikago import LaikagoEnv
    from tds_tpu.learn.ars import ARSConfig, init_ars, make_eval, make_train_step
    from tds_tpu.learn.nn import linear_policy
    from tds_tpu.parallel.mesh import make_mesh
    from tds_tpu.utils.checkpoint import save_checkpoint
    from tds_tpu.utils.experiment import Experiment

    exp = Experiment("laikago_ars", Cfg())
    cfg = exp.parse_args()
    exp.start()

    env = LaikagoEnv(dtype=jnp.float32)
    policy = linear_policy(env.observation_dim, env.action_dim)
    ars_cfg = ARSConfig(
        num_directions=cfg.num_directions,
        rollout_length=cfg.rollout_length,
        delta_std=cfg.delta_std,
        step_size=cfg.step_size,
        top_directions=cfg.top_directions,
        eval_interval=cfg.eval_interval,
    )
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    step_fn = make_train_step(env, policy, ars_cfg, mesh=mesh)
    eval_fn = make_eval(env, policy, ars_cfg, num_rollouts=8)
    state = init_ars(env, policy, jax.random.PRNGKey(cfg.seed))
    if cfg.resume:
        from tds_tpu.learn.running_stat import RunningStat
        from tds_tpu.utils.checkpoint import load_checkpoint

        saved, meta = load_checkpoint(cfg.resume)
        obs_stat = jax.tree_util.tree_map(jnp.asarray, saved["obs_stat"])
        if not isinstance(obs_stat, RunningStat):
            obs_stat = RunningStat(*obs_stat)
        state = state.replace(
            params=jnp.asarray(saved["params"]), obs_stat=obs_stat
        )
        print(f"resumed from {cfg.resume} (iteration {meta.get('iteration')})")

    for it in range(cfg.iterations):
        state, metrics = step_fn(state)
        if (it + 1) % cfg.eval_interval == 0:
            metrics.update(
                eval_fn(state, jax.random.PRNGKey(1000 + 100000 * cfg.seed + it))
            )
            save_checkpoint(
                cfg.checkpoint,
                {"params": state.params, "obs_stat": state.obs_stat},
                metadata={"iteration": it + 1},
            )
        exp.log_metrics(it, metrics)
        print(it, {k: round(float(v), 3) for k, v in metrics.items()})
    exp.finish()


if __name__ == "__main__":
    main()
