"""Neural-augmented dynamics (NeuralSim-style hybrid simulation).

The reference implements this via NeuralScalar — a scalar type whose named
values can be replaced/augmented by small MLPs resolved from a thread-local
blueprint registry (src/math/tiny/neural_scalar.hpp:20-588) — wired up by
NeuralAugmentation (src/utils/neural_augmentation.hpp:10-276) from a flat
parameter vector.

In JAX the same capability is direct function composition: an
:class:`AugmentationSpec` declares named output taps <- named input taps,
each backed by an MLP slice of one flat parameter vector, and
:func:`augment` applies ``value + net(inputs)`` (residual) or
``net(inputs)`` (replacement) inside any traced dynamics function. The
typical use (learned contact/friction residual forces on top of the
analytic engine) is packaged as :func:`make_residual_dynamics`.
"""

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from tds_tpu.learn.nn import Activation, MLPSpec


class Wiring:
    """One named augmentation: output_taps <- input_taps via an MLP
    (neural_augmentation.hpp ``add_wiring``)."""

    def __init__(
        self,
        name: str,
        input_dim: int,
        output_dim: int,
        hidden: Sequence[int] = (16, 16),
        activation: Activation = Activation.TANH,
        residual: bool = True,
        output_scale: float = 1.0,
    ):
        self.name = name
        self.residual = residual
        self.output_scale = output_scale
        dims = list(hidden) + [output_dim]
        acts = [activation] * len(hidden) + [Activation.IDENTITY]
        self.net = MLPSpec(input_dim, dims, acts)

    @property
    def num_parameters(self):
        return self.net.num_parameters


class AugmentationSpec:
    """Collection of wirings sharing one flat parameter vector, with L1/L2
    weight regularization (neural_augmentation.hpp regularization)."""

    def __init__(self, l1: float = 0.0, l2: float = 0.0):
        self.wirings: Dict[str, Wiring] = {}
        self._offsets: Dict[str, int] = {}
        self._total = 0
        self.l1 = l1
        self.l2 = l2

    def add_wiring(self, wiring: Wiring) -> "AugmentationSpec":
        self.wirings[wiring.name] = wiring
        self._offsets[wiring.name] = self._total
        self._total += wiring.num_parameters
        return self

    @property
    def num_parameters(self) -> int:
        return self._total

    def params_for(self, params, name: str):
        off = self._offsets[name]
        return params[..., off : off + self.wirings[name].num_parameters]

    def apply(self, params, name: str, inputs, value=None):
        """Evaluate wiring ``name``: returns value + net(inputs) when
        residual (and value given), else net(inputs)."""
        w = self.wirings[name]
        out = w.output_scale * w.net.apply(self.params_for(params, name), inputs)
        if w.residual and value is not None:
            return value + out
        return out

    def regularization(self, params):
        return self.l1 * jnp.sum(jnp.abs(params)) + self.l2 * jnp.sum(params**2)


def make_residual_dynamics(
    model,
    spec: AugmentationSpec,
    gravity,
    wiring_name: str = "tau_residual",
):
    """qdd = ABA(q, qd, tau + net([q, qd])) — the NeuralSim pattern of
    learning unmodeled joint-space effects on top of the analytic engine.

    The wiring must map (dof_q + dof_qd) -> dof_actuated.
    """
    from tds_tpu.dynamics.forward_dynamics import forward_dynamics

    def dynamics(params, q, qd, tau):
        inputs = jnp.concatenate([q, qd], axis=-1)
        tau_aug = spec.apply(params, wiring_name, inputs, value=tau)
        return forward_dynamics(model, q, qd, tau_aug, gravity)

    return dynamics
