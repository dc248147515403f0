"""Fully-connected policy networks (analog of src/math/neural_network.hpp).

Same activation set (identity, tanh, sin, relu, soft-relu/softplus, elu,
sigmoid, softsign; :33-42) and Xavier/He initialization (:44-48), as pure
functions over a flat parameter vector — ARS perturbs flat vectors, so the
flat layout [layer0 W, layer0 b, layer1 W, ...] is the native format
(matching NeuralNetwork::set_parameters ordering).
"""

import enum
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


class Activation(enum.IntEnum):
    IDENTITY = -1
    TANH = 0
    SIN = 1
    RELU = 2
    SOFT_RELU = 3
    ELU = 4
    SIGMOID = 5
    SOFTSIGN = 6


_ACT_FNS = {
    Activation.IDENTITY: lambda x: x,
    Activation.TANH: jnp.tanh,
    Activation.SIN: jnp.sin,
    Activation.RELU: jax.nn.relu,
    Activation.SOFT_RELU: jax.nn.softplus,
    Activation.ELU: jax.nn.elu,
    Activation.SIGMOID: jax.nn.sigmoid,
    Activation.SOFTSIGN: jax.nn.soft_sign,
}


class MLPSpec:
    """Network shape: input_dim -> hidden... -> output_dim with per-layer
    activations and biases."""

    def __init__(
        self,
        input_dim: int,
        layer_dims: Sequence[int],
        activations: Sequence[Activation] = None,
        use_bias: bool = True,
    ):
        self.input_dim = input_dim
        self.layer_dims = tuple(layer_dims)
        if activations is None:
            activations = [Activation.IDENTITY] * len(self.layer_dims)
        self.activations = tuple(Activation(a) for a in activations)
        assert len(self.activations) == len(self.layer_dims)
        self.use_bias = use_bias

    @property
    def num_parameters(self) -> int:
        n = 0
        prev = self.input_dim
        for d in self.layer_dims:
            n += prev * d + (d if self.use_bias else 0)
            prev = d
        return n

    def unflatten(self, params) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        layers = []
        prev = self.input_dim
        off = 0
        for d in self.layer_dims:
            w = params[..., off : off + prev * d].reshape(
                params.shape[:-1] + (d, prev)
            )
            off += prev * d
            if self.use_bias:
                b = params[..., off : off + d]
                off += d
            else:
                b = jnp.zeros(params.shape[:-1] + (d,), params.dtype)
            layers.append((w, b))
            prev = d
        return layers

    def apply(self, params, x):
        """Forward pass; broadcasts over leading batch dims of params/x."""
        for (w, b), act in zip(self.unflatten(params), self.activations):
            x = jnp.einsum("...ij,...j->...i", w, x) + b
            x = _ACT_FNS[Activation(act)](x)
        return x

    def init(self, key, scheme: str = "xavier", dtype=jnp.float32):
        """Xavier/He init of the flat parameter vector (zeros for biases)."""
        parts = []
        prev = self.input_dim
        for d in self.layer_dims:
            key, sub = jax.random.split(key)
            if scheme == "zero":
                w = jnp.zeros((d * prev,), dtype)
            elif scheme == "he":
                std = math.sqrt(2.0 / prev)
                w = std * jax.random.normal(sub, (d * prev,), dtype)
            else:  # xavier
                limit = math.sqrt(6.0 / (prev + d))
                w = jax.random.uniform(sub, (d * prev,), dtype, -limit, limit)
            parts.append(w)
            if self.use_bias:
                parts.append(jnp.zeros((d,), dtype))
            prev = d
        return jnp.concatenate(parts)


def linear_policy(observation_dim: int, action_dim: int) -> MLPSpec:
    """The ARS policy head used by the reference envs: one linear layer with
    learned bias (e.g. laikago_environment2.h:203-207)."""
    return MLPSpec(observation_dim, [action_dim], [Activation.IDENTITY])
