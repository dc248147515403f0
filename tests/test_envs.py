"""Environment tests: cartpole, laikago, ant; vectorized auto-reset."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.envs.cartpole import CartpoleEnv
from tds_tpu.envs.vectorized import VectorizedEnv, rollout

REF_DATA = "/root/reference/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not mounted"
)


class TestCartpole:
    def setup_method(self):
        self.env = CartpoleEnv()

    def test_reset_and_step(self):
        state, obs = self.env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (4,)
        assert np.all(np.abs(np.asarray(obs)) <= 0.05)
        state, obs, reward, done = self.env.step(state, jnp.zeros(1))
        assert float(reward) == 1.0
        assert not bool(done)

    def test_pole_falls_without_control(self):
        state, obs = self.env.reset(jax.random.PRNGKey(1))
        # push the pole slightly and let it topple
        state = state.replace(q=state.q.at[1].set(0.1))
        done_seen = False
        for _ in range(300):
            state, obs, reward, done = self.env.step(state, jnp.zeros(1))
            if bool(done):
                done_seen = True
                break
        assert done_seen, "uncontrolled pole should exceed 12deg"

    def test_feedback_balances(self):
        """A hand-tuned linear feedback keeps the pole up much longer than
        no control."""
        k = jnp.asarray([2.0, 40.0, 3.0, 6.0])  # x, theta, xd, thetad

        def policy(params, obs):
            return jnp.atleast_1d(jnp.dot(params, obs))

        total, alive = rollout(self.env, policy, k, jax.random.PRNGKey(2), 500)
        assert float(total) > 400  # survives most of the horizon

        total0, _ = rollout(
            self.env, lambda p, o: jnp.zeros(1), None, jax.random.PRNGKey(2), 500
        )
        assert float(total) > float(total0)

    def test_vectorized_auto_reset(self):
        venv = VectorizedEnv(self.env, num_envs=8)
        states, obs = venv.reset(jax.random.PRNGKey(3))
        assert obs.shape == (8, 4)
        # force some envs past the threshold: they must reset to small obs
        q = states.q.at[:4, 1].set(0.5)
        states = states.replace(q=q)
        states, obs, reward, done = venv.step(states, jnp.zeros((8, 1)))
        assert np.all(np.asarray(done[:4]))
        assert np.all(np.abs(np.asarray(obs[:4])) <= 0.06)
        assert np.all(~np.asarray(done[4:]))


@needs_ref
class TestLocomotion:
    def test_laikago_reset_settles(self):
        from tds_tpu.envs.laikago import LaikagoEnv

        env = LaikagoEnv()
        assert env.action_dim == 12
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(obs)))
        # chassis near start height after settling
        pos, up = env.base_pose_xyz_rpy(state.q)
        assert 0.3 < float(pos[2]) < 0.6
        assert float(up) > 0.9

    def test_laikago_steps_stable(self):
        from tds_tpu.envs.laikago import LaikagoEnv

        env = LaikagoEnv()
        state, obs = env.reset(jax.random.PRNGKey(1))

        def body(carry, _):
            state = carry
            state, obs, reward, done = env.step(
                state, jnp.zeros(12, dtype=state.q.dtype)
            )
            return state, (reward, done)

        state, (rewards, dones) = jax.lax.scan(body, state, None, length=200)
        assert np.all(np.isfinite(np.asarray(state.q)))
        # standing with PD to initial poses: should not fall in 0.2s
        assert not bool(dones[-1])

    def test_hopper_and_cheetah_step(self):
        from tds_tpu.envs.hopper import HalfCheetahEnv, HopperEnv

        for cls, n_act in ((HopperEnv, 3), (HalfCheetahEnv, 6)):
            env = cls(settle_steps=5)
            assert env.action_dim == n_act
            state, obs = env.reset(jax.random.PRNGKey(0))
            assert np.all(np.isfinite(np.asarray(obs)))
            for _ in range(30):
                state, obs, reward, done = env.step(
                    state, jnp.zeros(n_act, dtype=state.q.dtype)
                )
            assert np.all(np.isfinite(np.asarray(obs))), cls.__name__
            # standing with PD: no immediate termination
            assert not bool(done), cls.__name__

    def test_ant_steps(self):
        from tds_tpu.envs.ant import AntEnv

        env = AntEnv()
        assert env.action_dim == 8
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(obs)))
        for _ in range(20):
            state, obs, reward, done = env.step(
                state, jnp.zeros(8, dtype=state.q.dtype)
            )
        assert np.all(np.isfinite(np.asarray(obs)))


def test_whole_batch_step_equals_vmap():
    """Direct batched sim_step (leading batch axis, no vmap — the layout
    the Pallas PGS backend needs) matches vmap-of-single-env stepping.
    Guards the round-3 broadcast fixes in spatial.mv / the fixed-base
    base_acc."""
    from tds_tpu.envs.laikago import LaikagoEnv

    env = LaikagoEnv()
    q0, qd0 = env.initial_state(jax.random.PRNGKey(0))
    batch = 4
    qs = jnp.tile(q0[None], (batch, 1))
    qds = jnp.tile(qd0[None], (batch, 1))
    qds = qds.at[:, 0].set(jnp.linspace(-0.3, 0.3, batch))
    act = jnp.zeros((batch, env.action_dim), q0.dtype)

    qb, qdb = qs, qds
    for _ in range(5):
        qb, qdb = env.sim_step(qb, qdb, act)

    qv, qdv = qs, qds
    vstep = jax.vmap(env.sim_step)
    for _ in range(5):
        qv, qdv = vstep(qv, qdv, act)

    np.testing.assert_allclose(np.asarray(qb), np.asarray(qv), atol=1e-12)
    np.testing.assert_allclose(np.asarray(qdb), np.asarray(qdv), atol=1e-11)
