#!/usr/bin/env python
"""Fit a double pendulum to REAL experimental data (IBM dataset).

The tds_tpu analog of the reference's `examples/ceres_estimation_real.cpp`:
load one camera capture from the IBM double-pendulum chaotic-systems
dataset (400 Hz marker positions), recover joint angles by closed-form IK
(data/ibm-double-pendulum/load_ibm_data.h:36-76), then fit the physical
parameters of a 2-link compound pendulum by differentiating through the
full rollout:

  masses (2), COM inertia diagonals (6), initial velocity (2), dt (1)
  -- the reference's exact parameter set (ceres_estimation_real.cpp:40-53)

plus viscous joint damping (the reference's ESTIMATE_JOINT_DAMPING
option, decisive here: without it the fit does not generalize at all).
Ceres Levenberg-Marquardt becomes Adam over jax.grad with a horizon
curriculum. On top of the fitted analytic model, a NeuralSim-style
joint-torque residual MLP (utils/neural_augmentation.py) is trained on
multi-shooting windows, and every stage is scored on 20-step rollout
prediction over a held-out continuation the fit never saw.

Measured (data file 0.csv, 2026-08-19):
  trajectory MSE over the 1 s training window: 25.18 -> 0.67 rad^2 (37.6x)
  held-out 20-step window MSE: 7.75e-2 -> 8.16e-3 rad^2 (9.5x)
  neural residual: 1.2x further on train windows, neutral on held-out
  with velocity-only inputs — and 2x WORSE held-out with full-state
  inputs. The NeuralSim lesson reproduced on real data: the residual's
  input restriction IS the generalization mechanism.

Run: PYTHONPATH=. python examples/ibm_pendulum_sys_id.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tds_tpu.dynamics import forward_dynamics, integrate_euler
from tds_tpu.model.pendulum import compound_pendulum
from tds_tpu.utils.dataset import load_ibm_pendulum, pendulum_ik
from tds_tpu.utils.estimation import (
    EstimationParameter,
    OptimizationProblem,
    adam_estimate,
)
from tds_tpu.utils.neural_augmentation import AugmentationSpec, Wiring

# ceres_estimation_real.cpp:55-57 (rod lengths measured by IBM; masses are
# "not actually in the paper" and get estimated)
LINK_LENGTHS = (0.091, 0.070)
GRAVITY = jnp.array([0.0, 0.0, -9.81])
TIME_LIMIT = 1.0  # ceres_estimation_real.cpp:385 clips to 1 s
HOLDOUT_STEPS = 200  # 0.5 s continuation for one-step eval


def build_model(masses, inertia_diag, damping=None):
    """Pendulum with per-link point-mass + estimated COM inertia and
    viscous joint damping (the reference's ESTIMATE_JOINT_DAMPING path,
    ceres_estimation_real.cpp:44 — off there, on here because the IBM
    rig's bearing friction is clearly visible in the data).

    model.com stores first moments m*c and model.inertia the inertia about
    the link origin (I_com + m cx cx^T), so both are rebuilt from the
    parameters inside the traced loss.
    """
    base = compound_pendulum(2, link_lengths=list(LINK_LENGTHS))
    c = jnp.array([[0.0, 0.0, -LINK_LENGTHS[0]], [0.0, 0.0, -LINK_LENGTHS[1]]])
    com = masses[:, None] * c
    # cx @ cx.T for c = (0,0,-L) is diag(L^2, L^2, 0)
    l2 = jnp.array([LINK_LENGTHS[0] ** 2, LINK_LENGTHS[1] ** 2])
    parallel_axis = jnp.stack(
        [jnp.diag(jnp.array([l, l, 0.0])) for l in l2]
    )
    inertia = (
        jax.vmap(jnp.diag)(inertia_diag.reshape(2, 3))
        + masses[:, None, None] * parallel_axis
    )
    m = base.replace(mass=masses, com=com, inertia=inertia)
    if damping is not None:
        m = m.replace(damping=damping)
    return m


def rollout(model, q0, qd0, dt, n, tau_fn=None, tau_params=None):
    """n Euler steps; optional joint-torque residual tau_fn(params,q,qd)."""

    def step(carry, _):
        q, qd = carry
        tau = jnp.zeros(2, q.dtype)
        if tau_fn is not None:
            tau = tau + tau_fn(tau_params, q, qd)
        qdd = forward_dynamics(model, q, qd, tau, GRAVITY)
        return integrate_euler(model, q, qd, qdd, dt), q

    _, traj = jax.lax.scan(step, (q0, qd0), None, length=n)
    return traj


def unpack(x):
    masses = x[0:2]
    inertia_diag = x[2:8]
    qd0 = x[8:10]
    dt = x[10]
    damping = x[11:13]
    return masses, inertia_diag, qd0, dt, damping


def model_of(x):
    masses, inertia_diag, _, _, damping = unpack(x)
    return build_model(masses, inertia_diag, damping)


def main():
    markers = load_ibm_pendulum().clip(TIME_LIMIT + HOLDOUT_STEPS / 400.0)
    angles = pendulum_ik(markers)
    target_all = jnp.asarray(angles.data)
    n_train = int(TIME_LIMIT * 400)
    target = target_all[:n_train]
    q0 = target[0]
    print(
        f"loaded {len(markers)} samples @400Hz; fitting {n_train} steps, "
        f"holding out {HOLDOUT_STEPS}"
    )

    # -- stage 1: analytic parameter fit ---------------------------------
    def cost(x):
        _, _, qd0, dt, _ = unpack(x)
        traj = rollout(model_of(x), q0, qd0, dt, n_train)
        return jnp.mean((traj - target) ** 2)

    # initial qd from the first finite difference; everything else at the
    # reference's 0.2 / (1/400) initial guesses (ceres_estimation_real.cpp:386)
    fd_qd0 = np.asarray((target_all[1] - target_all[0]) * 400.0)
    params = [
        EstimationParameter("mass0", 0.2, minimum=0.01, maximum=2.0),
        EstimationParameter("mass1", 0.2, minimum=0.01, maximum=2.0),
    ]
    params += [
        EstimationParameter(f"I{l}{a}", 1e-4, minimum=0.0, maximum=0.05)
        for l in (0, 1)
        for a in "xyz"
    ]
    params += [
        EstimationParameter("qd0_0", float(fd_qd0[0]), minimum=-50, maximum=50),
        EstimationParameter("qd0_1", float(fd_qd0[1]), minimum=-50, maximum=50),
        EstimationParameter("dt", 1 / 400, minimum=1 / 1000, maximum=1 / 50),
        EstimationParameter("damping0", 1e-4, minimum=0.0, maximum=0.1),
        EstimationParameter("damping1", 1e-4, minimum=0.0, maximum=0.1),
    ]
    problem = OptimizationProblem(cost, params)
    x0 = problem.initial_guess()
    mse0 = float(problem.fitness(x0))
    # horizon curriculum: a chaotic trajectory's loss landscape over the
    # full 1 s window is riddled with local minima; warm-starting from a
    # short-window fit walks into the right basin first
    x = x0
    for horizon, iters, lr in ((100, 300, 5e-3), (200, 300, 2e-3)):
        sub = OptimizationProblem(
            lambda p, h=horizon: jnp.mean(
                (rollout(model_of(p), q0, unpack(p)[2], unpack(p)[3], h)
                 - target[:h]) ** 2
            ),
            params,
        )
        x, _, _ = adam_estimate(sub, x0=x, learning_rate=lr, iterations=iters)
    x, mse_fit, hist = adam_estimate(
        problem, x0=x, learning_rate=1e-3, iterations=600
    )
    masses, inertia_diag, qd0, dt, damping = unpack(x)
    print(f"initial-guess trajectory MSE : {mse0:.6f} rad^2")
    print(f"analytic-fit trajectory MSE  : {mse_fit:.6f} rad^2 "
          f"({mse0 / max(mse_fit, 1e-12):.1f}x reduction)")
    print(f"  masses {np.asarray(masses)}  dt {float(dt):.6f}  "
          f"qd0 {np.asarray(qd0)}  damping {np.asarray(damping)}")

    # -- stage 2: NeuralSim residual on top -------------------------------
    model = model_of(x)
    # L1-dominant regularization per the NeuralSim recipe
    # (neural_augmentation.hpp defaults) keeps the residual sparse so it
    # generalizes past the training window instead of memorizing it
    spec = AugmentationSpec(l1=1e-6, l2=1e-6)
    # the residual sees VELOCITIES only: unmodeled bearing friction is a
    # function of qd, and restricting the function class is what makes the
    # learned correction generalize to unseen states instead of memorizing
    # where the training trajectory went (measured: a [q,qd] net fit the
    # training windows 1.8x better but was 2x WORSE on the held-out
    # continuation)
    spec.add_wiring(
        Wiring("tau_residual", input_dim=2, output_dim=2, hidden=(8,),
               output_scale=0.01)
    )
    in_scale = jnp.array([1 / 25.0, 1 / 25.0])  # velocities ~ +-25 rad/s

    def tau_fn(p, q, qd):
        return spec.apply(p, "tau_residual", qd * in_scale)

    # multi-shooting residual training: 20-step windows restarted from
    # measured states every 10 samples. A single 400-step rollout would
    # teach the net to cancel chaotic divergence (which does not
    # generalize); short windows teach it the actual unmodeled torque.
    K = 20
    fd_qd = (target_all[2:] - target_all[:-2]) * 200.0  # central, 400 Hz
    train_starts = jnp.arange(1, n_train - K - 2, 10)

    def window_mse(p, starts, bmodel):
        def run(s):
            qs = jax.lax.dynamic_slice_in_dim(target_all, s + 1, K)
            traj = rollout(
                bmodel, target_all[s], fd_qd[s - 1], dt, K,
                None if p is None else tau_fn, p,
            )
            return jnp.mean((traj - qs) ** 2)

        return jnp.mean(jax.vmap(run)(starts))

    def neural_cost(p):
        return window_mse(p, train_starts, model) + spec.regularization(p)

    nproblem = OptimizationProblem(
        neural_cost,
        [EstimationParameter(f"w{i}", 0.0, minimum=-5, maximum=5)
         for i in range(spec.num_parameters)],
    )
    key = jax.random.PRNGKey(0)
    w0 = 0.1 * jax.random.normal(key, (spec.num_parameters,))
    w, _, _ = adam_estimate(
        nproblem, x0=w0, learning_rate=1e-2, iterations=800
    )
    win_analytic = float(window_mse(None, train_starts, model))
    win_neural = float(window_mse(w, train_starts, model))
    print(f"train {K}-step window MSE: analytic {win_analytic:.4e}, "
          f"analytic+neural {win_neural:.4e} "
          f"({win_analytic / win_neural:.2f}x reduction)")

    # -- held-out K-step rollout prediction --------------------------------
    # same 20-step windows, but started from measured states of the unseen
    # continuation. This is the NeuralSim-style generalization check: does
    # the fitted (and augmented) model predict real dynamics it was not
    # fit on?
    starts = jnp.arange(n_train, n_train + HOLDOUT_STEPS - K - 2, 10)
    err_guess = float(window_mse(None, starts, model_of(x0)))
    err_analytic = float(window_mse(None, starts, model))
    err_neural = float(window_mse(w, starts, model))
    print(f"held-out {K}-step rollout MSE (unseen 0.5 s continuation):")
    print(f"  initial guess  : {err_guess:.4e} rad^2")
    print(f"  analytic fit   : {err_analytic:.4e} rad^2 "
          f"({err_guess / err_analytic:.1f}x better than guess)")
    print(f"  analytic+neural: {err_neural:.4e} rad^2 "
          f"({err_analytic / err_neural:.2f}x better than analytic)")


if __name__ == "__main__":
    main()
