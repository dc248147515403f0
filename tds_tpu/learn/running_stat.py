"""Welford running observation statistics, batched and functional.

Analog of examples/ars/running_stat.h (Knuth/Welford accumulation) and the
per-env observation filters in ars_vectorized_worker.h:19-21,95-110. Here a
single aggregated statistic is maintained as a pytree (count, mean, m2);
batch updates use the parallel Welford merge, which also serves as the
cross-device psum-able reduction for multi-chip training.
"""

from typing import NamedTuple

import jax.numpy as jnp


class RunningStat(NamedTuple):
    count: jnp.ndarray  # ()
    mean: jnp.ndarray  # (dim,)
    m2: jnp.ndarray  # (dim,)

    @staticmethod
    def create(dim: int, dtype=jnp.float32) -> "RunningStat":
        return RunningStat(
            count=jnp.zeros((), dtype),
            mean=jnp.zeros((dim,), dtype),
            m2=jnp.zeros((dim,), dtype),
        )

    @property
    def std(self):
        var = jnp.where(self.count > 1, self.m2 / jnp.maximum(self.count, 1), 0.0)
        return jnp.sqrt(var)

    def update_batch(self, obs) -> "RunningStat":
        """Merge a batch of observations (…, dim) flattened over leading dims."""
        flat = obs.reshape(-1, obs.shape[-1])
        n_b = jnp.asarray(flat.shape[0], self.count.dtype)
        mean_b = jnp.mean(flat, axis=0)
        m2_b = jnp.sum((flat - mean_b) ** 2, axis=0)
        return self.merge(RunningStat(n_b, mean_b, m2_b))

    def merge(self, other: "RunningStat") -> "RunningStat":
        """Chan et al. parallel merge — associative, so it doubles as the
        multi-host reduction for observation filters."""
        n = self.count + other.count
        safe_n = jnp.maximum(n, 1)
        delta = other.mean - self.mean
        mean = self.mean + delta * (other.count / safe_n)
        m2 = self.m2 + other.m2 + delta**2 * (self.count * other.count / safe_n)
        return RunningStat(n, mean, m2)

    def normalize(self, obs, eps: float = 1e-7):
        """(obs - mean) / std with the reference's std>1e-7 guard
        (ars_vectorized_worker.h:102-107)."""
        std = self.std
        safe = jnp.where(std > eps, std, 1.0)
        return (obs - self.mean) / safe
