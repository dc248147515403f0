#!/usr/bin/env python
"""Fit a double pendulum to the Schmidt & Lipson (Science 2009) REAL data.

The second real dataset the reference bundles
(data/schmidt-lipson-exp-data/, consumed by
python/plotting/plot_estimation_trajectory.py:23 as the ground-truth
trajectory for its estimation examples). Unlike the IBM capture (camera
markers -> IK), this rig logs joint angles, velocities AND accelerations
directly at ~100 Hz, so the fit runs in two regimes:

  1. acceleration matching — vmap forward_dynamics over every (q, qd)
     sample against the measured qdd. No rollout, no chaos: a nearly
     convex fit of masses (2), COM inertia diagonals (6), link lengths
     (2, unknown for this rig) and viscous damping (2). The angle
     CONVENTION (absolute-per-arm vs relative, zero-down vs zero-up) is
     unknown too, so all four are screened by a short fit each and the
     winner kept — measured: absolute angles, zero hanging down, by >4x.
  2. K-step rollout prediction — the generalization score. Windows
     restarted from measured states on (a) the held-out continuation of
     the training trial and (b) the ENTIRELY unseen trial 1 (same rig,
     different release, swings over the top at up to 42 rad/s).

On top of the analytic fit, a NeuralSim-style velocity-only joint-torque
residual (utils/neural_augmentation.py) is trained on multi-shooting
windows, mirroring examples/ibm_pendulum_sys_id.py.

A data quirk that dominates everything: the recordings DROP FRAMES
(nominal 100 Hz but gaps up to 150 ms). Until windows spanning a dropped
frame are filtered out, every rollout score is bounded by timing error,
not model error (measured: the filter alone turned a 2x held-out
improvement into 36x).

Measured (real_double_pend_h_1.txt trial 0, 2026-08-20):
  convention screen: abs-down 154 vs rel-down 3134 (>20x margin)
  acceleration MSE: 2187 -> 149.6 rad^2/s^4 (15x; 99.3% of measured
    acceleration variance explained — residual RMS 8.6 rad/s^2 vs the
    ~2.6-4.2 noise floor of the provided accelerations themselves)
  held-out 10-step window MSE (trial-0 continuation): 4.74e-3 -> 1.33e-4
    rad^2 (36x vs initial guess)
  unseen trial 1 transfer (swings over the top, |w| to 42 rad/s):
    1.17e-2 -> 7.73e-4 rad^2 (15x)
  neural residual: NEUTRAL here (1.07x held-out, 0.99x trial-1) — the
    analytic model + dry friction already sits at the data's noise floor,
    so the residual has no structured physics left to absorb. The IBM
    pipeline (ibm_pendulum_sys_id.py) shows the opposite regime: there the
    markers hide bearing friction the analytic fit can't see, and the
    velocity-only residual buys a further 1.2x. Together the two datasets
    bracket when NeuralSim-style augmentation pays.

Run: PYTHONPATH=. python examples/schmidt_lipson_sys_id.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tds_tpu.dynamics import forward_dynamics, integrate_euler
from tds_tpu.model.pendulum import compound_pendulum
from tds_tpu.utils.dataset import load_schmidt_lipson
from tds_tpu.utils.estimation import (
    EstimationParameter,
    OptimizationProblem,
    adam_estimate,
)
from tds_tpu.utils.neural_augmentation import AugmentationSpec, Wiring

GRAVITY = jnp.array([0.0, 0.0, -9.81])
N_TRAIN = 600  # 6 s of trial 0; the remaining ~2.2 s is held out
K = 10  # rollout-prediction window length (0.1 s)
SUBSTEPS = 4  # Euler substeps per 10 ms sample (|w| reaches 42 rad/s)


def dry_tau(c, qd):
    """Smooth Coulomb (dry) joint friction -c*tanh(qd/0.2): the
    Schmidt-Lipson rig's bearings stick visibly at low speed, which a
    viscous-only term cannot express (adding it measurably improves the
    held-out fit; see module docstring)."""
    return -c * jnp.tanh(qd / 0.2)


def build_model(x):
    """Pendulum from the flat parameter vector: masses (2), COM inertia
    diagonals (6), link lengths (2), viscous damping (2), dry friction (2,
    consumed by dry_tau not the model). Lengths enter both the joint
    placement (x_t_pos) and the COM offsets, so the model is rebuilt from
    scratch inside the traced loss (all MultiBodyModel array leaves are
    differentiable)."""
    masses, inertia_diag, lengths, damping = (
        x[0:2], x[2:8], x[8:10], x[10:12],
    )
    base = compound_pendulum(2, link_lengths=[1.0, 1.0])
    c = jnp.stack(
        [jnp.array([0.0, 0.0, -1.0]) * lengths[0],
         jnp.array([0.0, 0.0, -1.0]) * lengths[1]]
    )
    x_t_pos = base.x_t_pos.at[1, 2].set(-lengths[0])
    com = masses[:, None] * c
    parallel_axis = jnp.stack(
        [jnp.diag(jnp.array([l * l, l * l, 0.0 * l])) for l in lengths]
    )
    inertia = (
        jax.vmap(jnp.diag)(inertia_diag.reshape(2, 3))
        + masses[:, None, None] * parallel_axis
    )
    return base.replace(
        x_t_pos=x_t_pos, mass=masses, com=com, inertia=inertia,
        damping=damping,
    )


# ---------------------------------------------------------------------------
# angle conventions: the dataset doesn't document whether th1/th2 are
# per-arm absolute angles or joint-relative, nor where zero points. Each
# candidate maps measured (th, w, a) -> the model's relative coordinates.
def to_relative(th, convention):
    if convention.startswith("abs"):
        out = np.stack([th[:, 0], th[:, 1] - th[:, 0]], axis=1).copy()
    else:
        out = th.copy()
    if convention.endswith("up"):
        out[:, 0] += np.pi
    return out


CONVENTIONS = ("abs-down", "abs-up", "rel-down", "rel-up")


def load_arrays(trial):
    ds = load_schmidt_lipson(trial=trial)
    th = ds.select(["th1", "th2"])
    w = ds.select(["w1s", "w2s"])  # smoothed velocities
    a = ds.select(["a1", "a2"])
    return th, w, a, ds.dt, ds.column("t")


def good_starts(t, starts, k, dt, tol=0.002):
    """Windows whose K samples are uniformly spaced: the recordings DROP
    FRAMES (trial 0: median gap 10 ms but gaps up to 150 ms, sigma 6.6 ms)
    and a fixed-dt rollout across a dropped frame scores model error
    against the wrong time — filter those windows out of every score."""
    t = np.asarray(t)
    ok = []
    for s in starts:
        gaps = np.diff(t[s : s + k + 1])
        if len(gaps) == k and np.all(np.abs(gaps - dt) < tol):
            ok.append(s)
    return np.asarray(ok, dtype=np.int64)


def initial_params():
    params = [
        EstimationParameter("mass0", 0.5, minimum=0.01, maximum=5.0),
        EstimationParameter("mass1", 0.5, minimum=0.01, maximum=5.0),
    ]
    params += [
        EstimationParameter(f"I{l}{ax}", 1e-3, minimum=0.0, maximum=0.5)
        for l in (0, 1)
        for ax in "xyz"
    ]
    params += [
        EstimationParameter("len0", 0.3, minimum=0.05, maximum=1.5),
        EstimationParameter("len1", 0.3, minimum=0.05, maximum=1.5),
        EstimationParameter("damp0", 1e-3, minimum=0.0, maximum=1.0),
        EstimationParameter("damp1", 1e-3, minimum=0.0, maximum=1.0),
        EstimationParameter("dry0", 1e-3, minimum=0.0, maximum=0.5),
        EstimationParameter("dry1", 1e-3, minimum=0.0, maximum=0.5),
    ]
    return params


def accel_problem(q, qd, qdd, params):
    qj, qdj, qddj = jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd)

    def cost(x):
        model = build_model(x)

        def one(qi, qdi, qddi):
            pred = forward_dynamics(
                model, qi, qdi, dry_tau(x[12:14], qdi), GRAVITY
            )
            return jnp.sum((pred - qddi) ** 2)

        return jnp.mean(jax.vmap(one)(qj, qdj, qddj))

    return OptimizationProblem(cost, params)


def rollout(model, q0, qd0, dt, n, tau_fn=None, tau_params=None):
    """n measured-rate steps of SUBSTEPS semi-implicit Euler substeps."""

    def step(carry, _):
        q, qd = carry

        def sub(carry2, _):
            q, qd = carry2
            tau = jnp.zeros(2, q.dtype)
            if tau_fn is not None:
                tau = tau + tau_fn(tau_params, q, qd)
            qdd = forward_dynamics(model, q, qd, tau, GRAVITY)
            return integrate_euler(model, q, qd, qdd, dt / SUBSTEPS), None

        (q, qd), _ = jax.lax.scan(sub, (q, qd), None, length=SUBSTEPS)
        return (q, qd), q

    _, traj = jax.lax.scan(step, (q0, qd0), None, length=n)
    return traj


def window_mse(model, q, qd, dt, starts, tau_fn=None, tau_params=None):
    """K-step rollout prediction from measured states (the IBM example's
    multi-shooting generalization score)."""
    qj, qdj = jnp.asarray(q), jnp.asarray(qd)

    def run(s):
        traj = rollout(model, qj[s], qdj[s], dt, K, tau_fn, tau_params)
        target = jax.lax.dynamic_slice_in_dim(qj, s + 1, K)
        return jnp.mean((traj - target) ** 2)

    return jnp.mean(jax.vmap(run)(jnp.asarray(starts)))


def fit(quiet=False, screen_iters=150, fit_iters=1200, neural_iters=600):
    """Full pipeline; returns a dict of measured errors (used by the
    regression test with reduced iteration counts)."""
    th, w, a, dt, t0s = load_arrays(trial=0)
    dt = 0.01  # nominal sample period; windows with dropped frames are filtered

    # -- stage 0: convention screening on accelerations ------------------
    params = initial_params()
    results = {}
    for conv in CONVENTIONS:
        q = to_relative(th[:N_TRAIN], conv)
        qd = to_relative(w[:N_TRAIN], conv.split("-")[0] + "-down")
        qdd = to_relative(a[:N_TRAIN], conv.split("-")[0] + "-down")
        prob = accel_problem(q, qd, qdd, params)
        x, err, _ = adam_estimate(
            prob, learning_rate=2e-2, iterations=screen_iters
        )
        results[conv] = (float(err), x)
        if not quiet:
            print(f"convention {conv:9s}: accel MSE {float(err):10.3f}")
    conv = min(results, key=lambda c: results[c][0])
    if not quiet:
        print(f"selected convention: {conv}")

    q_all = to_relative(th, conv)
    qd_all = to_relative(w, conv.split("-")[0] + "-down")
    qdd_all = to_relative(a, conv.split("-")[0] + "-down")
    q, qd, qdd = q_all[:N_TRAIN], qd_all[:N_TRAIN], qdd_all[:N_TRAIN]

    # -- stage 1: full acceleration fit (lr-staged Adam) -----------------
    prob = accel_problem(q, qd, qdd, params)
    x0 = prob.initial_guess()
    mse0 = float(prob.fitness(x0))
    x = results[conv][1]
    for lr, n in ((1e-2, fit_iters), (3e-3, fit_iters), (1e-3, fit_iters // 2)):
        x, mse_fit, _ = adam_estimate(
            prob, x0=x, learning_rate=lr, iterations=n
        )
    if not quiet:
        print(f"acceleration MSE: {mse0:.2f} -> {float(mse_fit):.3f} "
              f"({mse0 / float(mse_fit):.0f}x)")
        print(f"  masses {np.asarray(x[0:2]).round(3)} "
              f"lengths {np.asarray(x[8:10]).round(3)} "
              f"damping {np.asarray(x[10:12]).round(4)} "
              f"dry {np.asarray(x[12:14]).round(4)}")

    # -- stage 1b: multi-shooting refinement of the SAME physical params --
    # the acceleration fit weighs every sample equally in qdd-space; the
    # deployment metric is K-step state prediction, so refine the physical
    # parameters directly on short-window rollouts (chaos-safe: windows
    # restart from measured states)
    refine_starts = good_starts(t0s, np.arange(0, N_TRAIN - K - 1, 5), K, dt)

    def analytic_tau(xv):
        return lambda p, qi, qdi: dry_tau(xv[12:14], qdi)

    def refine_cost(xv):
        return window_mse(build_model(xv), q_all[: N_TRAIN + K + 1],
                          qd_all[: N_TRAIN + K + 1], dt, refine_starts,
                          analytic_tau(xv), None)

    rproblem = OptimizationProblem(refine_cost, params)
    pre = float(refine_cost(x))
    x, _, _ = adam_estimate(
        rproblem, x0=x, learning_rate=1e-3, iterations=fit_iters // 2
    )
    post = float(refine_cost(x))
    if not quiet:
        print(f"multi-shooting refinement: train window MSE "
              f"{pre:.3e} -> {post:.3e} ({pre / max(post, 1e-18):.2f}x)")
    model = build_model(x)

    # -- stage 2: velocity-only neural residual (NeuralSim recipe) -------
    spec = AugmentationSpec(l1=1e-6, l2=1e-6)
    # output_scale sized to the rig's torque scale: gravity torque is
    # m g l ~ 0.7 * 9.81 * 0.14 ~ 1 N m, so a 0.1-scale residual can
    # express up to ~10% unmodeled torque
    spec.add_wiring(
        Wiring("tau_residual", input_dim=2, output_dim=2, hidden=(8,),
               output_scale=0.1)
    )
    in_scale = jnp.array([1 / 10.0, 1 / 40.0])  # |w1|<11, |w2|<42 rad/s

    def tau_fn(p, qi, qdi):
        return dry_tau(x[12:14], qdi) + spec.apply(
            p, "tau_residual", qdi * in_scale
        )

    train_starts = good_starts(t0s, np.arange(0, N_TRAIN - K - 1, 5), K, dt)

    def neural_cost(p):
        return window_mse(model, q, qd, dt, train_starts, tau_fn, p) \
            + spec.regularization(p)

    nproblem = OptimizationProblem(
        neural_cost,
        [EstimationParameter(f"nw{i}", 0.0, minimum=-5, maximum=5)
         for i in range(spec.num_parameters)],
    )
    w0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (spec.num_parameters,))
    wgt, _, _ = adam_estimate(
        nproblem, x0=w0, learning_rate=1e-2, iterations=neural_iters
    )

    # -- held-out scoring -------------------------------------------------
    # guess = initial parameter vector WITHOUT dry friction (its guess is
    # ~0 anyway); fit = analytic model + fitted dry friction; neural adds
    # the residual on top
    out = {"conv": conv, "accel_mse0": mse0, "accel_mse": float(mse_fit)}
    model0 = build_model(x0)
    atau = analytic_tau(x)
    holdout_starts = good_starts(
        t0s, np.arange(N_TRAIN, len(q_all) - K - 1, 5), K, dt
    )
    for tag, (qs, qds, dts, starts) in {
        "holdout": (q_all, qd_all, dt, holdout_starts),
    }.items():
        e0 = float(window_mse(model0, qs, qds, dts, starts))
        e1 = float(window_mse(model, qs, qds, dts, starts, atau, None))
        e2 = float(window_mse(model, qs, qds, dts, starts, tau_fn, wgt))
        out[f"{tag}_guess"], out[f"{tag}_fit"], out[f"{tag}_neural"] = e0, e1, e2
        if not quiet:
            print(f"{tag} {K}-step window MSE: guess {e0:.3e} -> "
                  f"fit {e1:.3e} ({e0 / e1:.0f}x) -> +neural {e2:.3e} "
                  f"({e1 / e2:.2f}x further)")

    # transfer to the entirely unseen trial 1 (same rig, new release)
    th1t, w1t, _, dt1, t1s = load_arrays(trial=1)
    dt1 = 0.01
    q1 = to_relative(th1t, conv)
    qd1 = to_relative(w1t, conv.split("-")[0] + "-down")
    starts1 = good_starts(t1s, np.arange(0, len(q1) - K - 1, 5), K, dt1)
    e0 = float(window_mse(model0, q1, qd1, dt1, starts1))
    e1 = float(window_mse(model, q1, qd1, dt1, starts1, atau, None))
    e2 = float(window_mse(model, q1, qd1, dt1, starts1, tau_fn, wgt))
    out["trial1_guess"], out["trial1_fit"], out["trial1_neural"] = e0, e1, e2
    if not quiet:
        print(f"unseen trial-1 {K}-step window MSE: guess {e0:.3e} -> "
              f"fit {e1:.3e} ({e0 / e1:.0f}x) -> +neural {e2:.3e} "
              f"({e1 / e2:.2f}x further)")
    return out


if __name__ == "__main__":
    fit()
