"""Scatter-free in-place-style updates for traced step code.

``x.at[..., i].set(v)`` and even ``x.at[..., i:i+1].set(v)`` lower to the
XLA ``scatter`` primitive. XLA folds/fuses these fine, but Mosaic (Pallas
TPU) has no scatter lowering, so any step code that might run inside a
Pallas kernel must phrase static-index updates as
``lax.dynamic_update_slice`` instead — which Mosaic supports and which is
also never worse under plain XLA. Narrow trailing-axis updates with
*static* Python-int starts are the only pattern the physics step needs
(q/qd/tau layouts are trace-time constants).
"""

import jax.numpy as jnp
from jax import lax


def set_slice(x, start: int, value, axis: int = -1):
    """x[..., start:start+value.shape[axis]] = value along ``axis``.

    ``start`` must be a static Python int; ``value`` has the same rank as
    ``x`` and full extent in every other dimension. Phrased as slice +
    concatenate (not dynamic_update_slice: the axon plugin's Mosaic lacks
    a dus lowering too); XLA fuses either form identically.
    """
    if axis != -1:
        raise NotImplementedError("only trailing-axis updates")
    width = value.shape[-1]
    n = x.shape[-1]
    parts = []
    if start > 0:
        parts.append(lax.slice_in_dim(x, 0, start, axis=-1))
    parts.append(value.astype(x.dtype))
    if start + width < n:
        parts.append(lax.slice_in_dim(x, start + width, n, axis=-1))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def set_index(x, i: int, value, axis: int = -1):
    """x[..., i] = value (``value`` has rank one less than ``x``)."""
    if axis != -1:
        raise NotImplementedError("only trailing-axis single-index updates")
    return set_slice(x, i, value[..., None])
