"""Learning stack tests: MLP, RunningStat, ARS on cartpole."""

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.envs.cartpole import CartpoleEnv
from tds_tpu.learn.ars import ARSConfig, init_ars, make_eval, make_train_step
from tds_tpu.learn.nn import Activation, MLPSpec, linear_policy
from tds_tpu.learn.running_stat import RunningStat


def test_mlp_shapes_and_flat_params():
    spec = MLPSpec(4, [8, 2], [Activation.TANH, Activation.IDENTITY])
    assert spec.num_parameters == (4 * 8 + 8) + (8 * 2 + 2)
    params = spec.init(jax.random.PRNGKey(0))
    y = spec.apply(params, jnp.ones(4))
    assert y.shape == (2,)
    # batched params (vmap-style broadcast)
    pb = jnp.stack([params, params * 2])
    yb = jax.vmap(spec.apply)(pb, jnp.ones((2, 4)))
    assert yb.shape == (2, 2)
    np.testing.assert_allclose(yb[0], y, atol=1e-6)


def test_running_stat_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.normal(loc=3.0, scale=2.0, size=(1000, 5))
    stat = RunningStat.create(5, jnp.float64)
    for chunk in np.split(data, 10):
        stat = stat.update_batch(jnp.asarray(chunk))
    np.testing.assert_allclose(stat.mean, data.mean(0), rtol=1e-9)
    np.testing.assert_allclose(stat.std, data.std(0), rtol=1e-9)
    # normalization
    norm = stat.normalize(jnp.asarray(data[0]))
    np.testing.assert_allclose(
        norm, (data[0] - data.mean(0)) / data.std(0), rtol=1e-7
    )


def test_running_stat_merge_associative():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(100, 3))
    b = rng.normal(size=(50, 3)) + 1.0
    s_ab = RunningStat.create(3, jnp.float64).update_batch(jnp.asarray(a)).update_batch(jnp.asarray(b))
    s_all = RunningStat.create(3, jnp.float64).update_batch(
        jnp.asarray(np.concatenate([a, b]))
    )
    np.testing.assert_allclose(s_ab.mean, s_all.mean, rtol=1e-9)
    np.testing.assert_allclose(s_ab.std, s_all.std, rtol=1e-9)


def test_ars_survives_nan_envs():
    """A rollout whose simulation diverges to NaN must not poison params."""
    import jax.numpy as jnp

    from tds_tpu.envs.base import Env, EnvState

    class ExplodingEnv(Env):
        observation_dim = 2
        action_dim = 1

        def reset(self, key):
            state = EnvState(
                q=jnp.zeros(2), qd=jnp.zeros(2), t=jnp.zeros((), jnp.int32),
                key=key,
            )
            return state, jnp.zeros(2)

        def step(self, state, action):
            # blows up after 5 steps
            q = jnp.where(state.t >= 5, jnp.full(2, jnp.nan), state.q + 0.1)
            new = EnvState(q=q, qd=state.qd, t=state.t + 1, key=state.key)
            reward = jnp.sum(q)
            return new, q, reward, jnp.asarray(False)

    env = ExplodingEnv()
    policy = linear_policy(2, 1)
    config = ARSConfig(num_directions=4, rollout_length=20, delta_std=0.1,
                       step_size=0.1)
    step_fn = make_train_step(env, policy, config)
    state = init_ars(env, policy, jax.random.PRNGKey(0))
    for _ in range(3):
        state, metrics = step_fn(state)
    assert np.all(np.isfinite(np.asarray(state.params)))
    assert np.all(np.isfinite(np.asarray(state.obs_stat.mean)))
    assert np.isfinite(float(metrics["reward_pos_mean"]))


def test_ars_improves_cartpole():
    env = CartpoleEnv()
    policy = linear_policy(env.observation_dim, env.action_dim)
    config = ARSConfig(
        num_directions=64, rollout_length=200, delta_std=0.3, step_size=1.0,
        shift=0.0,
    )
    step_fn = make_train_step(env, policy, config)
    eval_fn = make_eval(env, policy, config, num_rollouts=8)
    state = init_ars(env, policy, jax.random.PRNGKey(0))
    before = float(eval_fn(state, jax.random.PRNGKey(100))["eval_reward_mean"])
    for _ in range(30):
        state, metrics = step_fn(state)
    after = float(eval_fn(state, jax.random.PRNGKey(100))["eval_reward_mean"])
    # zero policy survives ~40 steps; trained should do clearly better
    assert after > before + 8, (before, after)
    assert state.total_timesteps > 0
    assert float(state.obs_stat.count) > 0


def test_apg_learns_cartpole_balance():
    """First-order policy learning through the simulator (learn/apg.py):
    jax.grad of a smooth balance cost through a lax.scan rollout trains a
    policy that survives the REAL env's termination rules. The capability
    the reference's differentiable core enables but never demonstrates
    (its trainers are zeroth-order ARS / PPO)."""
    from tds_tpu.envs.vectorized import rollout
    from tds_tpu.learn.apg import APGConfig, init_apg, make_apg_train_step
    from tds_tpu.learn.nn import Activation, MLPSpec

    env = CartpoleEnv()
    policy = MLPSpec(
        env.observation_dim,
        [16, env.action_dim],
        [Activation.TANH, Activation.TANH],
    )
    cfg = APGConfig(horizon=150, batch=16, learning_rate=2e-2)
    state, opt = init_apg(env, policy, jax.random.PRNGKey(0), cfg)
    train = jax.jit(
        make_apg_train_step(
            env,
            policy,
            cfg,
            reward_fn=lambda q, qd, a: -(
                q[1] ** 2
                + 0.05 * q[0] ** 2
                + 0.01 * qd[1] ** 2
                + 0.001 * qd[0] ** 2
                + 1e-4 * jnp.sum(a**2)
            ),
            opt=opt,
        )
    )
    _, steps_before = rollout(
        env, policy.apply, state.params, jax.random.PRNGKey(123), 200
    )
    first_return = None
    for it in range(90):
        state, metrics = train(state)
        if first_return is None:
            first_return = float(metrics["mean_return"])
    assert jnp.all(jnp.isfinite(state.params))
    assert float(metrics["mean_return"]) > first_return  # smooth cost improved
    _, steps_after = rollout(
        env, policy.apply, state.params, jax.random.PRNGKey(123), 200
    )
    # trained policy balances through the full horizon (the example reaches
    # 200/200 by ~iter 50); untrained xavier policy falls much earlier
    assert int(steps_after) >= 150, (int(steps_before), int(steps_after))
    assert int(steps_after) > int(steps_before)


def test_apg_truncated_bptt_and_no_remat_paths():
    """The truncation and remat knobs compile and make progress."""
    from tds_tpu.learn.apg import APGConfig, init_apg, make_apg_train_step

    env = CartpoleEnv()
    policy = linear_policy(env.observation_dim, env.action_dim)
    cfg = APGConfig(horizon=40, batch=4, learning_rate=1e-2, remat=False,
                    truncation=10)
    state, opt = init_apg(env, policy, jax.random.PRNGKey(1), cfg)
    train = jax.jit(make_apg_train_step(
        env, policy, cfg,
        reward_fn=lambda q, qd, a: -(q[1] ** 2), opt=opt))
    r0 = None
    for _ in range(5):
        state, metrics = train(state)
        if r0 is None:
            r0 = float(metrics["mean_return"])
    assert jnp.isfinite(metrics["mean_return"])
    assert float(metrics["grad_norm"]) > 0.0  # gradients flow despite cuts


def test_apg_through_laikago_contact():
    """APG gradients flow through the full articulated MLCP contact pipeline
    and improve a smooth forward-progress objective (examples/laikago_apg.py
    runs the same setup longer and reaches upright ~0.4 m/s creep)."""
    from tds_tpu.envs.laikago import LaikagoEnv
    from tds_tpu.learn.apg import APGConfig, init_apg, make_apg_train_step
    from tds_tpu.learn.nn import Activation, MLPSpec

    env = LaikagoEnv(dtype=jnp.float32)
    policy = MLPSpec(
        env.observation_dim,
        [32, env.action_dim],
        [Activation.TANH, Activation.TANH],
    )

    def forward_reward(q, qd, a):
        _, up = env.base_pose_xyz_rpy(q)
        return qd[0] + 0.5 * up - 1e-3 * jnp.sum(a**2)

    cfg = APGConfig(horizon=30, batch=2, learning_rate=5e-3, truncation=10)
    state, opt = init_apg(env, policy, jax.random.PRNGKey(0), cfg)
    train = jax.jit(
        make_apg_train_step(env, policy, cfg, reward_fn=forward_reward, opt=opt)
    )
    returns = []
    for _ in range(25):
        state, metrics = train(state)
        returns.append(float(metrics["mean_return"]))
        assert jnp.isfinite(metrics["grad_norm"])  # no contact-grad blow-up
    assert jnp.all(jnp.isfinite(state.params))
    # late-phase mean beats the first iteration's return
    assert sum(returns[-5:]) / 5 > returns[0], returns


def test_committed_apg_policy_walks():
    """Pins logs/laikago_apg/policy_h100.pkl (400 APG iterations, horizon
    100): >= 0.25 m forward over a 500-step scanned eval, never leaving
    upright posture. Guards both the checkpoint and the APG training
    setup's reproducibility."""
    import os
    import pickle

    from tds_tpu.envs.laikago import LaikagoEnv
    from tds_tpu.learn.nn import Activation, MLPSpec

    path = os.path.join(
        os.path.dirname(__file__), "..", "logs", "laikago_apg", "policy_h100.pkl"
    )
    with open(path, "rb") as f:
        params = jnp.asarray(pickle.load(f)["params"], jnp.float32)

    env = LaikagoEnv(dtype=jnp.float32)
    policy = MLPSpec(
        env.observation_dim,
        [32, env.action_dim],
        [Activation.TANH, Activation.TANH],
    )

    st0, obs0 = env.reset(jax.random.PRNGKey(5))

    @jax.jit
    def rollout(state, obs):
        def body(carry, _):
            state, obs = carry
            state, obs, _, done = env.step(state, policy.apply(params, obs))
            _, up = env.base_pose_xyz_rpy(state.q)
            return (state, obs), (up, done)

        (state, _), (ups, dones) = jax.lax.scan(body, (state, obs), None, length=500)
        return state.q[0], jnp.min(ups), jnp.any(dones)

    x, up_min, any_done = rollout(st0, obs0)
    dx = float(x) - float(st0.q[0])
    assert not bool(any_done)
    assert dx > 0.25, dx  # actual: 0.279 m in 0.5 s (gait still accelerating)
    assert float(up_min) > 0.8, float(up_min)  # actual: 0.97
