"""Analytic policy gradients (APG): train a policy by differentiating the
simulator itself.

The reference proves its simulator is differentiable end-to-end (gradient
through a 5000-step LCP rollout, test_codegen.cpp:169-206; billiard
optimization python/examples/billiard_optimization.py) but never closes the
loop into policy LEARNING — its trainers are zeroth-order (ARS) or
model-free (PPO elsewhere). Here the differentiable step is a jax function,
so first-order policy optimization is a `jax.grad` over a `lax.scan`
rollout: the TPU runs policy MLP + physics + backprop through both as one
fused compiled program, no host round-trips.

TPU-first design notes:
- the rollout is `lax.scan` over the horizon with the batch vmapped inside,
  so XLA sees (batch, ...) tensors per step — the same batched layout the
  forward bench uses;
- `jax.checkpoint` (remat) on the step body bounds reverse-mode memory at
  O(sqrt(T)) activations for long horizons, the standard trade of FLOPs for
  HBM on TPU;
- optional truncated BPTT (`truncation=k` inserts stop_gradient every k
  steps) tames exploding gradients through stiff contact chains while
  keeping the scan a single compiled loop.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class APGConfig(NamedTuple):
    horizon: int = 200
    batch: int = 32
    learning_rate: float = 1e-2
    remat: bool = True
    truncation: int = 0  # 0 = full backprop through time
    max_grad_norm: float = 10.0


class APGState(NamedTuple):
    params: jnp.ndarray
    opt_state: tuple
    key: jnp.ndarray


def init_apg(env, policy, key, cfg: APGConfig):
    """Xavier-init policy params + Adam state."""
    import optax

    pkey, rkey = jax.random.split(key)
    params = policy.init(pkey)
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.learning_rate),
    )
    return APGState(params=params, opt_state=opt.init(params), key=rkey), opt


def make_apg_train_step(
    env,
    policy,
    cfg: APGConfig,
    reward_fn: Optional[Callable] = None,
    opt=None,
):
    """Returns ``train_step(state) -> (state, metrics)``, jittable.

    ``reward_fn(q, qd, action) -> per-env reward`` must be smooth in its
    inputs for useful gradients; survival-style indicator rewards (constant
    while alive) backprop to zero. When omitted, the env's own step reward
    is used — correct for envs whose reward is already smooth (e.g. the
    locomotion envs' forward-progress term), degenerate for pure survival
    bonuses.

    The env contract is the functional core one: ``reset(key)``,
    ``sim_step(q, qd, action)``, ``observation(q, qd)``,
    ``action_transform(raw)`` (tds_tpu.envs.base.Env).
    """
    import optax

    if opt is None:
        opt = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.learning_rate),
        )

    def rollout_return(params, key):
        keys = jax.random.split(key, cfg.batch)
        states, _ = jax.vmap(env.reset)(keys)
        q0, qd0 = states.q, states.qd

        def step(carry, i):
            q, qd = carry
            if cfg.truncation:
                # cut the gradient chain every `truncation` steps
                cut = (i % cfg.truncation) == 0
                q = jnp.where(cut, jax.lax.stop_gradient(q), q)
                qd = jnp.where(cut, jax.lax.stop_gradient(qd), qd)
            obs = env.observation(q, qd)
            action = env.action_transform(
                jax.vmap(policy.apply, in_axes=(None, 0))(params, obs)
            )
            q2, qd2 = jax.vmap(env.sim_step)(q, qd, action)
            if reward_fn is not None:
                r = jax.vmap(reward_fn)(q2, qd2, action)
            else:
                _, _, r, _ = jax.vmap(env.step)(
                    type(states)(q=q, qd=qd, t=states.t, key=states.key), action
                )
            return (q2, qd2), r

        body = jax.checkpoint(step) if cfg.remat else step
        (_, _), rewards = jax.lax.scan(
            body, (q0, qd0), jnp.arange(cfg.horizon)
        )
        return jnp.mean(jnp.sum(rewards, axis=0))

    def train_step(state: APGState):
        key, sub = jax.random.split(state.key)
        ret, grads = jax.value_and_grad(
            lambda p: -rollout_return(p, sub)
        )(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "mean_return": -ret,
            "grad_norm": optax.global_norm(grads),
        }
        return APGState(params=params, opt_state=opt_state, key=key), metrics

    return train_step
