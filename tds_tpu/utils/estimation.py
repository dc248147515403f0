"""Parameter-estimation toolkit (system identification).

Analog of the reference's estimation stack:
- EstimationParameter (bounds + L1/L2 regularization, src/utils/parameter.hpp:9-53)
- OptimizationProblem (src/utils/optimization_problem.hpp:13-87)
- CeresEstimator / gradient-descent optimizers (ceres_estimator.hpp,
  optim_gd.hpp) -> here: an Adam/LBFGS-style loop over jax.grad with box
  projection, plus a plain gradient-descent matching optim_gd
"""

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class EstimationParameter:
    """Named scalar parameter with bounds and regularization
    (parameter.hpp:9-53)."""

    name: str
    value: float = 1.0
    minimum: float = -jnp.inf
    maximum: float = jnp.inf
    l1_regularization: float = 0.0
    l2_regularization: float = 0.0


class OptimizationProblem:
    """Bundles a cost over a flat parameter vector with box bounds and
    regularization; exposes fitness/gradient (optimization_problem.hpp)."""

    def __init__(self, cost_fn: Callable, parameters: Sequence[EstimationParameter]):
        self.parameters = list(parameters)
        self._cost = cost_fn
        lo = jnp.asarray([p.minimum for p in self.parameters])
        hi = jnp.asarray([p.maximum for p in self.parameters])
        l1 = jnp.asarray([p.l1_regularization for p in self.parameters])
        l2 = jnp.asarray([p.l2_regularization for p in self.parameters])
        self.lower, self.upper = lo, hi

        def full_cost(x):
            reg = jnp.sum(l1 * jnp.abs(x)) + jnp.sum(l2 * x * x)
            return cost_fn(x) + reg

        self.fitness = jax.jit(full_cost)
        self.gradient = jax.jit(jax.grad(full_cost))

    def initial_guess(self):
        return jnp.asarray([p.value for p in self.parameters])

    def project(self, x):
        return jnp.clip(x, self.lower, self.upper)


def gradient_descent(problem: OptimizationProblem, x0=None, learning_rate=1e-2,
                     iterations: int = 100):
    """Projected gradient descent (optim_gd.hpp analog).

    Returns (best_x, best_cost, history).
    """
    x = problem.initial_guess() if x0 is None else jnp.asarray(x0)
    best_x, best_c = x, float(problem.fitness(x))
    history = []
    for _ in range(iterations):
        g = problem.gradient(x)
        x = problem.project(x - learning_rate * g)
        c = float(problem.fitness(x))
        history.append(c)
        if c < best_c:
            best_x, best_c = x, c
    return best_x, best_c, history


def adam_estimate(problem: OptimizationProblem, x0=None, learning_rate=1e-2,
                  iterations: int = 200, b1=0.9, b2=0.999, eps=1e-8):
    """Adam with box projection — the workhorse estimator replacing
    CeresEstimator for sys-id (tracks best parameters like
    ceres_estimator.hpp:49-389)."""
    x = problem.initial_guess() if x0 is None else jnp.asarray(x0)
    m = jnp.zeros_like(x)
    v = jnp.zeros_like(x)
    best_x, best_c = x, float(problem.fitness(x))
    history = []
    for t in range(1, iterations + 1):
        g = problem.gradient(x)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        x = problem.project(x - learning_rate * mh / (jnp.sqrt(vh) + eps))
        c = float(problem.fitness(x))
        history.append(c)
        if c < best_c:
            best_x, best_c = x, c
    return best_x, best_c, history
