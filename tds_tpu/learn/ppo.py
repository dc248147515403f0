"""PPO learner over vectorized physics envs (clip objective + GAE).

Beyond the reference's ARS-only trainer: a standard proximal policy
optimization loop running fully on-device — rollout collection is a
vmapped scan with auto-reset, advantage estimation and minibatch updates
jit into one program per iteration. Continuous Gaussian policy with state-
independent log-std.
"""

from functools import partial
from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tds_tpu.learn.nn import Activation, MLPSpec
from tds_tpu.learn.running_stat import RunningStat


class PPOConfig(NamedTuple):
    num_envs: int = 64
    unroll_length: int = 64
    num_minibatches: int = 8
    num_epochs: int = 4
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_epsilon: float = 0.2
    entropy_cost: float = 1e-3
    value_cost: float = 0.5
    max_grad_norm: float = 0.5
    init_log_std: float = -0.5
    # Linear lr anneal over this many training iterations (0 = constant).
    # Round-4 finding (tests/test_ppo_ant_policy.py): with constant lr the
    # deterministic mean policy collapses late in training while the
    # stochastic return keeps climbing; annealing to ~0 freezes the policy
    # into its converged basin instead of walking out of it.
    lr_anneal_iterations: int = 0


class PPONetworks:
    def __init__(self, observation_dim: int, action_dim: int,
                 hidden: Sequence[int] = (64, 64)):
        acts = [Activation.TANH] * len(hidden) + [Activation.IDENTITY]
        self.policy = MLPSpec(observation_dim, list(hidden) + [action_dim], acts)
        self.value = MLPSpec(observation_dim, list(hidden) + [1], acts)
        self.action_dim = action_dim

    def init(self, key, config: PPOConfig):
        kp, kv = jax.random.split(key)
        return {
            "policy": self.policy.init(kp),
            "value": self.value.init(kv),
            "log_std": jnp.full((self.action_dim,), config.init_log_std),
        }

    def dist(self, params, obs):
        mean = self.policy.apply(params["policy"], obs)
        return mean, jnp.exp(params["log_std"])

    def log_prob(self, params, obs, action):
        mean, std = self.dist(params, obs)
        z = (action - mean) / std
        return jnp.sum(
            -0.5 * z**2 - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi), axis=-1
        )

    def entropy(self, params):
        std = jnp.exp(params["log_std"])
        return jnp.sum(0.5 * jnp.log(2 * jnp.pi * jnp.e) + jnp.log(std))

    def sample(self, params, obs, key):
        mean, std = self.dist(params, obs)
        eps = jax.random.normal(key, mean.shape, mean.dtype)
        action = mean + std * eps
        return action, self.log_prob(params, obs, action)


@struct.dataclass
class PPOState:
    params: dict
    opt_state: object
    env_states: object
    obs: jnp.ndarray
    obs_stat: RunningStat
    key: jnp.ndarray
    iteration: jnp.ndarray


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    value: jnp.ndarray


def make_ppo(env, networks: PPONetworks, config: PPOConfig):
    """Returns (init_fn(key) -> PPOState, step_fn(state) -> (state, metrics))."""
    if config.lr_anneal_iterations:
        lr = optax.linear_schedule(
            config.learning_rate,
            0.0,
            # adam sees num_epochs*num_minibatches updates per iteration
            config.lr_anneal_iterations
            * config.num_epochs
            * config.num_minibatches,
        )
    else:
        lr = config.learning_rate
    optimizer = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(lr),
    )
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)

    def init_fn(key):
        key, k_net, k_env = jax.random.split(key, 3)
        params = networks.init(k_net, config)
        env_states, obs = v_reset(jax.random.split(k_env, config.num_envs))
        return PPOState(
            params=params,
            opt_state=optimizer.init(params),
            env_states=env_states,
            obs=obs,
            obs_stat=RunningStat.create(env.observation_dim, obs.dtype),
            key=key,
            iteration=jnp.zeros((), jnp.int32),
        )

    def collect(state: PPOState):
        def step(carry, _):
            env_states, obs, key = carry
            key, k_act = jax.random.split(key)
            obs_n = state.obs_stat.normalize(obs)
            action, logp = networks.sample(state.params, obs_n, k_act)
            value = networks.value.apply(state.params["value"], obs_n)[..., 0]
            env_action = env.action_transform(action)
            env_states, next_obs, reward, done = v_step(env_states, env_action)
            # auto-reset finished envs
            def maybe_reset(s, o, d):
                k1, k2 = jax.random.split(s.key)

                def do(_):
                    ns, no = env.reset(k2)
                    return ns.replace(key=k1), no

                return jax.lax.cond(d, do, lambda _: (s, o), None)

            env_states, next_obs = jax.vmap(maybe_reset)(env_states, next_obs, done)
            t = Transition(obs, action, logp, reward, done.astype(obs.dtype), value)
            return (env_states, next_obs, key), t

        (env_states, obs, key), traj = jax.lax.scan(
            step, (state.env_states, state.obs, state.key), None,
            length=config.unroll_length,
        )
        return env_states, obs, key, traj

    def gae(traj: Transition, last_value):
        def scan_fn(carry, t):
            next_value, next_adv = carry
            delta = (
                t.reward + config.gamma * next_value * (1 - t.done) - t.value
            )
            adv = delta + config.gamma * config.gae_lambda * (1 - t.done) * next_adv
            return (t.value, adv), adv

        _, advantages = jax.lax.scan(
            scan_fn, (last_value, jnp.zeros_like(last_value)), traj, reverse=True
        )
        returns = advantages + traj.value
        return advantages, returns

    def loss_fn(params, batch, obs_stat):
        obs, action, old_logp, advantage, ret = batch
        obs_n = obs_stat.normalize(obs)
        logp = networks.log_prob(params, obs_n, action)
        ratio = jnp.exp(logp - old_logp)
        adv = (advantage - advantage.mean()) / (advantage.std() + 1e-8)
        unclipped = ratio * adv
        clipped = jnp.clip(
            ratio, 1 - config.clip_epsilon, 1 + config.clip_epsilon
        ) * adv
        policy_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
        value = networks.value.apply(params["value"], obs_n)[..., 0]
        value_loss = jnp.mean((value - ret) ** 2)
        entropy = networks.entropy(params)
        total = (
            policy_loss
            + config.value_cost * value_loss
            - config.entropy_cost * entropy
        )
        return total, (policy_loss, value_loss)

    def step_fn(state: PPOState):
        env_states, obs, key, traj = collect(state)
        obs_n_last = state.obs_stat.normalize(obs)
        last_value = networks.value.apply(state.params["value"], obs_n_last)[..., 0]
        advantages, returns = gae(traj, last_value)

        n = config.unroll_length * config.num_envs
        flat = (
            traj.obs.reshape(n, -1),
            traj.action.reshape(n, -1),
            traj.log_prob.reshape(n),
            advantages.reshape(n),
            returns.reshape(n),
        )

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)
            shuf = tuple(x[perm] for x in flat)
            mb = n // config.num_minibatches

            def minibatch(carry, i):
                params, opt_state = carry
                batch = tuple(
                    jax.lax.dynamic_slice_in_dim(x, i * mb, mb) for x in shuf
                )
                grads, _ = jax.grad(loss_fn, has_aux=True)(
                    params, batch, state.obs_stat
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), None

            (params, opt_state), _ = jax.lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(config.num_minibatches),
            )
            return (params, opt_state, key), None

        (params, opt_state, key), _ = jax.lax.scan(
            epoch, (state.params, state.opt_state, key), None,
            length=config.num_epochs,
        )

        obs_stat = state.obs_stat.update_batch(traj.obs.reshape(n, -1))
        new_state = PPOState(
            params=params,
            opt_state=opt_state,
            env_states=env_states,
            obs=obs,
            obs_stat=obs_stat,
            key=key,
            iteration=state.iteration + 1,
        )
        metrics = {
            "reward_mean": jnp.mean(traj.reward),
            "episode_done_rate": jnp.mean(traj.done),
            "value_mean": jnp.mean(traj.value),
        }
        return new_state, metrics

    return init_fn, jax.jit(step_fn)
