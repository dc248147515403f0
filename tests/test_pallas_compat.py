"""Pallas-compatibility invariants of the hot step path.

The axon plugin's Mosaic (Pallas TPU) build cannot lower ``scatter``,
``gather``, or ``dynamic_update_slice``, and its ``dot_general`` lowering
mis-emits MLIR dimension attributes for unbatched-times-batched operands
(round-3 finding, PROGRESS.md). Round 3 rewrote the step path to avoid
all of them — via ``algebra/update.py`` concat-updates, explicit
``lax.slice_in_dim`` reads, and smallmat VPU contractions — which also
measured ~3.5% FASTER under plain XLA (6.26M vs 6.04M laikago steps/s,
batch 16384 on the v5e).

These tests freeze that property so a future edit doesn't silently
reintroduce a primitive that kills kernel-embedding (and the guard is
cheap: jaxpr-level only, no compile).
"""

import jax
import jax.numpy as jnp
import pytest

# Primitives the plugin's Mosaic cannot lower (or mis-lowers) inside a
# Pallas TPU kernel body.
FORBIDDEN = ("scatter", "scatter-add", "gather", "dynamic_update_slice",
             "dot_general")


def _collect_forbidden(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in FORBIDDEN:
            out.append(eqn.primitive.name)
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                _collect_forbidden(sub.jaxpr, out)


def _assert_clean(fn, *args, allow=()):
    jaxpr = jax.make_jaxpr(fn)(*args)
    bad = []
    _collect_forbidden(jaxpr.jaxpr, bad)
    bad = [b for b in bad if b not in allow]
    assert not bad, f"step body contains Mosaic-incompatible primitives: {bad}"


def _batched_step(env):
    def step(q, qd):
        action = jnp.zeros(q.shape[:-1] + (env.action_dim,), q.dtype)
        return env.sim_step(q, qd, action)

    q = jnp.zeros((4, env.model.dof_q), jnp.float32)
    qd = jnp.zeros((4, env.model.dof_qd), jnp.float32)
    return step, q, qd


def test_laikago_step_is_mosaic_clean():
    from tds_tpu.envs.laikago import LaikagoEnv

    _assert_clean(*_batched_step(LaikagoEnv(dtype=jnp.float32)))


def test_ant_step_is_mosaic_clean():
    # dot_general is allowed here: with ant's contact count the Delassus
    # product deliberately takes the large-contraction einsum path
    # (contact/mlcp.py _delassus, n_rows > 16 — the round-2 ADVICE fix);
    # everything else must stay kernel-embeddable.
    from tds_tpu.envs.ant import AntEnv

    _assert_clean(*_batched_step(AntEnv(dtype=jnp.float32)),
                  allow=("dot_general",))


def test_cartpole_step_is_mosaic_clean():
    from tds_tpu.envs.cartpole import CartpoleEnv

    _assert_clean(*_batched_step(CartpoleEnv(dtype=jnp.float32)))


def test_update_helpers_match_at_set():
    from tds_tpu.algebra.update import set_index, set_slice

    x = jnp.arange(24.0).reshape(2, 12)
    v = -jnp.ones((2, 3))
    assert jnp.array_equal(set_slice(x, 4, v), x.at[:, 4:7].set(v))
    assert jnp.array_equal(set_slice(x, 0, v), x.at[:, 0:3].set(v))
    assert jnp.array_equal(set_slice(x, 9, v), x.at[:, 9:12].set(v))
    w = jnp.full((2,), 7.0)
    assert jnp.array_equal(set_index(x, 5, w), x.at[:, 5].set(w))
    assert jnp.array_equal(set_index(x, 0, w), x.at[:, 0].set(w))
    assert jnp.array_equal(set_index(x, 11, w), x.at[:, 11].set(w))
    full = jnp.ones((2, 12))
    assert jnp.array_equal(set_slice(x, 0, full), full)


def test_update_helpers_grad():
    from tds_tpu.algebra.update import set_index

    def f(v):
        x = jnp.zeros((4,))
        return jnp.sum(set_index(x, 2, v) ** 2)

    g = jax.grad(f)(jnp.asarray(3.0))
    assert float(g) == pytest.approx(6.0)
