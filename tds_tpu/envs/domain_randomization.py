"""Domain randomization: per-env model parameters under vmap.

Because MultiBodyModel is a pytree whose numeric leaves are differentiable
inputs, a batch of randomized models is just a stacked pytree; vmapping the
step over (model, state) gives every env its own masses/frictions at zero
extra compile cost. (The reference has no equivalent — its model is baked
into the compiled kernel.)
"""

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tds_tpu.model.multibody import MultiBodyModel


class RandomizationSpec(NamedTuple):
    """Multiplicative log-uniform ranges per field; 1.0 = untouched."""

    mass_range: Tuple[float, float] = (0.8, 1.2)
    damping_range: Tuple[float, float] = (1.0, 1.0)
    com_range: Tuple[float, float] = (1.0, 1.0)


def _scale(key, shape, lo, hi, dtype):
    if lo == hi:
        return jnp.full(shape, lo, dtype)
    u = jax.random.uniform(key, shape, dtype)
    return jnp.exp(u * (jnp.log(hi) - jnp.log(lo)) + jnp.log(lo))


def randomize_model(model: MultiBodyModel, key, spec: RandomizationSpec):
    """One randomized model (vmap over keys for a batch)."""
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = model.mass.dtype
    nl = model.num_links
    m_scale = _scale(k1, (nl,), *spec.mass_range, dtype)
    d_scale = _scale(k2, (nl,), *spec.damping_range, dtype)
    c_scale = _scale(k3, (nl,), *spec.com_range, dtype)
    return model.replace(
        mass=model.mass * m_scale,
        com=model.com * (m_scale * c_scale)[:, None],
        inertia=model.inertia * m_scale[:, None, None],
        damping=model.damping * d_scale,
    )


def randomize_batch(model: MultiBodyModel, key, num: int, spec=RandomizationSpec()):
    """Stacked pytree of ``num`` randomized models (leaves gain a leading
    batch axis; static topology shared)."""
    keys = jax.random.split(key, num)
    return jax.vmap(lambda k: randomize_model(model, k, spec))(keys)


def vmap_with_models(step_fn: Callable):
    """vmap a ``step_fn(model, *state)`` over both the model batch and the
    state batch."""
    return jax.vmap(step_fn, in_axes=0)
