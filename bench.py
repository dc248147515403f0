#!/usr/bin/env python
"""Benchmark: batched laikago env-steps/s with contact on one chip.

Prints ONE JSON line:
  {"metric": "laikago_env_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N / 2.0e5}

Baseline: the reference's derived headline throughput, ~2.0e5 env-steps/s on
an RTX 2080 (BASELINE.md: 4096 envs x 50 Hz, README.md:14 +
examples/ars/cuda_codegen.cpp:42).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tds_tpu_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _probe_backend(timeout_s: float = 120.0) -> None:
    """Fail fast if the TPU tunnel relay is dead.

    The axon plugin's backend init HANGS indefinitely (not errors) when the
    harness-owned port relay (/root/.tpu_init.py) has died — observed
    2026-08-17, PROGRESS.md. Probe jax.devices() in a subprocess with a
    timeout so the driver gets a diagnosable nonzero exit instead of a hung
    round-end bench. The probe releases the tunnel before we init our own
    backend (single-client tunnel)."""
    import subprocess

    if os.environ.get("TDS_BENCH_SKIP_PROBE"):
        return
    probe = subprocess.Popen(
        [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        out, _ = probe.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        probe.kill()
        probe.wait()
        print(
            json.dumps(
                {
                    "metric": "laikago_env_steps_per_s",
                    "error": (
                        f"backend init hung >{timeout_s:.0f}s — TPU tunnel "
                        "relay down (harness-owned /root/.tpu_init.py; see "
                        "PROGRESS.md 'Tunnel incident')"
                    ),
                }
            )
        )
        sys.exit(2)
    print(f"# backend probe: {out.strip()}", file=sys.stderr)


def main():
    _probe_backend()
    # batch swept in round 3 (PROGRESS.md): 4096 -> 4.97M steps/s, 8192 ->
    # 5.59M, 16384 -> 6.02M, 20480 -> 6.01M, 32768 -> 5.09M. 16384 sits on
    # the plateau; beyond it HBM traffic (not parallelism) is the wall.
    # Round-5 per-robot sweep (tools/batch_sweep.py, scan-fused rollouts):
    # the SCAN-path knee is earlier than the step-path plateau — laikago
    # 4096: 7.42M vs 16384: 6.91M; ant 4096: 1.87M vs 16384: 1.14M;
    # humanoid 2048: 771K vs 4096: 637K; terrain 4096: 467K. Scan metrics
    # below use these measured best batches (capped by TDS_BENCH_BATCH so
    # a CPU smoke run stays cheap).
    batch = int(os.environ.get("TDS_BENCH_BATCH", 16384))
    best_scan_batch = {
        "laikago": 4096, "ant": 4096, "humanoid": 2048, "terrain": 4096,
    }
    inner_steps = int(os.environ.get("TDS_BENCH_STEPS", 100))

    from tds_tpu.envs.laikago import LaikagoEnv

    env = LaikagoEnv(dtype=jnp.float32)

    # One jitted step, driven by a host dispatch loop. NOT lax.scan: on this
    # TPU stack, while-loops (and donated buffers) trigger a pathological
    # server-side compile — the same step body compiles in ~20-40s alone vs
    # 300-450s inside scan — and async dispatch hides the host loop entirely
    # (measured within noise of the scan version's steady-state throughput).
    @jax.jit
    def step(q, qd):
        action = jnp.zeros(q.shape[:-1] + (env.action_dim,), q.dtype)
        return jax.vmap(env.sim_step)(q, qd, action)

    key = jax.random.PRNGKey(0)
    q0, qd0 = env.initial_state(key)
    qs = jnp.tile(q0[None, :], (batch, 1))
    qds = jnp.tile(qd0[None, :], (batch, 1))

    # Staged warmup: compile the ABA subgraph first. The compile service
    # caches lowered kernels per session, so warming the dynamics kernels
    # with this subgraph cuts the full-step compile from 350-930s (measured,
    # high variance) to ~16s; total cold wall ~2.5 min.
    from tds_tpu.dynamics.forward_dynamics import forward_dynamics

    model = env.model
    gravity = jnp.asarray(env.gravity, jnp.float32)

    @jax.jit
    def _warm(q, qd):
        return jax.vmap(
            lambda a, b: forward_dynamics(
                model, a, b, jnp.zeros(model.dof_qd, a.dtype), gravity
            )
        )(q, qd)

    t0 = time.time()
    jax.block_until_ready(_warm(qs, qds))
    warm_s = time.time() - t0

    # AOT-compile once; the compiled object is reused for timing AND for
    # XLA's cost analysis (a second jit trace would recompile server-side).
    t0 = time.time()
    step = step.lower(qs, qds).compile()
    q_w, qd_w = step(qs, qds)
    jax.block_until_ready(q_w)
    compile_s = time.time() - t0

    # timed runs
    best = float("inf")
    for _ in range(3):
        out_q, out_qd = qs, qds
        t0 = time.time()
        for _ in range(inner_steps):
            out_q, out_qd = step(out_q, out_qd)
        jax.block_until_ready(out_q)
        best = min(best, time.time() - t0)

    finite = bool(jnp.all(jnp.isfinite(out_q)))
    steps_per_s = batch * inner_steps / best

    # ---- roofline accounting -----------------------------------------------
    # XLA's own cost model for the compiled step: FLOPs and HBM bytes per
    # launch. v5e peaks: 819 GB/s HBM; 197 TFLOP/s bf16 MXU (this workload
    # is f32 VPU-dominated small-matrix math, so HBM %-of-peak is the
    # meaningful ceiling; TFLOP/s is reported against the bf16 MXU peak for
    # honesty about how far from the matmul roof a physics step sits).
    HBM_PEAK_GBS = 819.0
    MXU_PEAK_TFLOPS = 197.0

    # NB: no measured-bandwidth anchor. Micro-timing single kernels through
    # the axon tunnel is unreliable: block_until_ready returns early for
    # loop-carrying programs (10 chained 4096^3 matmuls "measured" at 2255
    # TFLOP/s, >2x any TPU's peak) while forcing a value readback adds a
    # fixed ~37 ms RTT that swamps sub-ms kernels (measured 2026-08-17).
    # The steps/s headline uses 100 dependency-chained dispatches, which
    # cross-checks against end-to-end ARS training wall-clock; the roofline
    # fields below come from XLA's cost model with the spec-sheet peak.
    flops_per_step = bytes_per_step = None
    try:
        ca = step.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        launch_flops = float(ca.get("flops", 0.0))
        launch_bytes = float(ca.get("bytes accessed", 0.0))
        flops_per_step = launch_flops / batch
        bytes_per_step = launch_bytes / batch
    except Exception as e:  # cost model unavailable on this backend
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    roofline = {}
    if flops_per_step:
        achieved_tflops = flops_per_step * steps_per_s / 1e12
        achieved_gbs = bytes_per_step * steps_per_s / 1e9
        roofline = {
            # flops/bytes are XLA cost-model numbers: bytes is a LOGICAL
            # upper bound (pre-fusion accesses), so pct >100 means the
            # compiled step serves that fraction from VMEM/registers —
            # i.e. the step is at or past the naive HBM roofline
            "flops_per_step": round(flops_per_step, 1),
            "bytes_per_step_logical": round(bytes_per_step, 1),
            "achieved_tflops": round(achieved_tflops, 3),
            "hbm_gbs_logical": round(achieved_gbs, 1),
            "pct_hbm_spec_peak": round(100.0 * achieved_gbs / HBM_PEAK_GBS, 1),
            "pct_mxu_peak": round(100.0 * achieved_tflops / MXU_PEAK_TFLOPS, 2),
        }

    # secondary metric: FUSED policy-MLP + physics + reward/done + auto-reset
    # steps/s — the number that bounds ARS wall-clock (reference measures
    # only the zero-action forward_zero kernel; we report both).
    from tds_tpu.learn.nn import linear_policy

    policy = linear_policy(env.observation_dim, env.action_dim)
    params = jnp.zeros((policy.num_parameters,), jnp.float32)

    @jax.jit
    def step_policy(states, obs):
        actions = jax.vmap(lambda o: policy.apply(params, o))(obs)
        states, obs, reward, done = jax.vmap(env.step)(states, actions)
        return states, obs

    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    states0, obs0 = jax.vmap(env.reset)(keys)
    t0 = time.time()
    st_w, obs_w = step_policy(states0, obs0)
    jax.block_until_ready(obs_w)
    compile_policy_s = time.time() - t0
    best_policy = float("inf")
    for _ in range(3):
        st, obs = states0, obs0
        t0 = time.time()
        for _ in range(inner_steps):
            st, obs = step_policy(st, obs)
        jax.block_until_ready(obs)
        best_policy = min(best_policy, time.time() - t0)
    policy_steps_per_s = batch * inner_steps / best_policy

    result = {
        "metric": "laikago_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 2.0e5, 3),
        **roofline,
    }
    print(json.dumps(result))
    print(
        f"# batch={batch} steps={inner_steps} best={best:.4f}s "
        f"compile={compile_s:.1f}s warmup_compile={warm_s:.1f}s "
        f"finite={finite} device={jax.devices()[0]}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "laikago_policy_env_steps_per_s",
                "value": round(policy_steps_per_s, 1),
                "unit": "steps/s",
                "vs_baseline": round(policy_steps_per_s / 2.0e5, 3),
            }
        ),
        file=sys.stderr,
    )
    print(
        f"# policy-fused: best={best_policy:.4f}s compile={compile_policy_s:.1f}s",
        file=sys.stderr,
    )

    # headline metric: the TPU-native training inner loop — a 1000-step
    # lax.scan rollout (policy MLP + physics + reward/done + auto-reset all
    # on-device, no host feedback) with a forced scalar readback so the
    # 37 ms tunnel RTT is <2% of the measured 2.4 s window. This is the
    # shape ARS/APG actually run (learn/ars.py rollouts are scans) and the
    # design SURVEY.md §7 calls for in place of the reference's per-step
    # host feedback loop (cuda_codegen.cpp:316). Measured 2026-08-19:
    # scan fusion buys ~8% over 100 dependency-chained dispatches.
    import numpy as np

    scan_len = 1000

    def rollout(states, obs):
        def body(carry, _):
            st, ob = carry
            actions = jax.vmap(lambda o: policy.apply(params, o))(ob)
            st, ob, _reward, _done = jax.vmap(env.step)(st, actions)
            return (st, ob), ()

        # unroll=2 measured 7.00M vs 6.92M at unroll=1 (unroll=4 regresses
        # to 6.97M with 2x the compile) — 2026-08-19, batch 16384.
        (states, obs), _ = jax.lax.scan(
            body, (states, obs), None, length=scan_len, unroll=2
        )
        return states, obs

    # measured best scan batch (see best_scan_batch above): 4096 beats the
    # step-path's 16384 plateau by ~7% on the scan-fused rollout
    scan_batch = min(batch, best_scan_batch["laikago"])
    if scan_batch != batch:
        scan_keys = jax.random.split(jax.random.PRNGKey(3), scan_batch)
        scan_states0, scan_obs0 = jax.jit(jax.vmap(env.reset))(scan_keys)
        jax.block_until_ready(scan_obs0)
    else:
        scan_states0, scan_obs0 = states0, obs0
    t0 = time.time()
    rollout_c = jax.jit(rollout).lower(scan_states0, scan_obs0).compile()
    compile_rollout_s = time.time() - t0
    best_rollout = float("inf")
    for _ in range(3):
        t0 = time.time()
        _st, obs_out = rollout_c(scan_states0, scan_obs0)
        np.asarray(obs_out[0, 0])  # force device->host readback
        best_rollout = min(best_rollout, time.time() - t0)
    rollout_steps_per_s = scan_batch * scan_len / best_rollout
    print(
        f"# scan-rollout: batch={scan_batch} len={scan_len} "
        f"best={best_rollout:.4f}s compile={compile_rollout_s:.1f}s",
        file=sys.stderr,
    )

    # ---- performance ENVELOPE (VERDICT r3 #3): not one robot, one point --
    # ant (more contacts/fewer dofs), humanoid (37 links, spherical base,
    # the round-4 flagship), laikago on analytic-heightfield terrain with
    # 9 egocentric height-scan rays, and end-to-end ARS iterations/s (the
    # number a user training a policy actually feels). Each is a scan-fused
    # rollout like the headline; failures degrade to an error field rather
    # than killing the bench.
    envelope = {}
    if not os.environ.get("TDS_BENCH_NO_ENVELOPE"):
        def measure_env(mk_env, label, ebatch, elen):
            e = mk_env()
            pol = linear_policy(e.observation_dim, e.action_dim)
            pp = jnp.zeros((pol.num_parameters,), jnp.float32)

            def roll(states, obs):
                def body(carry, _):
                    st, ob = carry
                    a = jax.vmap(lambda o: pol.apply(pp, o))(ob)
                    st, ob, _r, _d = jax.vmap(e.step)(st, a)
                    return (st, ob), ()

                (states, obs), _ = jax.lax.scan(
                    body, (states, obs), None, length=elen, unroll=2
                )
                return states, obs

            ks = jax.random.split(jax.random.PRNGKey(2), ebatch)
            st0, ob0 = jax.jit(jax.vmap(e.reset))(ks)
            jax.block_until_ready(ob0)
            t0 = time.time()
            rc = jax.jit(roll).lower(st0, ob0).compile()
            csec = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                _s, ob = rc(st0, ob0)
                np.asarray(ob[0, 0])
                best = min(best, time.time() - t0)
            val = ebatch * elen / best
            # roofline fields for EVERY envelope robot (VERDICT r4 #7), same
            # XLA cost model + spec-sheet peaks as the headline; the compiled
            # object covers elen scanned steps, so normalize by batch*len
            roof = {}
            try:
                ca = rc.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                fl = float(ca.get("flops", 0.0)) / (ebatch * elen)
                by = float(ca.get("bytes accessed", 0.0)) / (ebatch * elen)
                if fl:
                    roof = {
                        "flops_per_step": round(fl, 1),
                        "bytes_per_step_logical": round(by, 1),
                        "achieved_tflops": round(fl * val / 1e12, 3),
                        "hbm_gbs_logical": round(by * val / 1e9, 1),
                        "pct_hbm_spec_peak": round(
                            100.0 * by * val / 1e9 / HBM_PEAK_GBS, 1
                        ),
                        "pct_mxu_peak": round(
                            100.0 * fl * val / 1e12 / MXU_PEAK_TFLOPS, 2
                        ),
                    }
            except Exception as exc:
                print(f"# {label} cost_analysis unavailable: {exc}",
                      file=sys.stderr)
            print(
                f"# {label}: batch={ebatch} len={elen} best={best:.4f}s "
                f"compile={csec:.1f}s",
                file=sys.stderr,
            )
            return round(val, 1), roof

        def mk_ant():
            from tds_tpu.envs.ant import AntEnv

            return AntEnv(dtype=jnp.float32)

        def mk_humanoid():
            from tds_tpu.envs.humanoid import HumanoidEnv

            return HumanoidEnv(dtype=jnp.float32)

        def mk_terrain():
            import math

            from tds_tpu.utils.terrain import make_heightfield

            terrain = make_heightfield(
                13, 7, (-1.0, 5.0), (-1.5, 1.5),
                lambda x, y: 0.02 * math.sin(math.pi * x) * math.cos(math.pi * y),
                max_contacts=3,
            )
            scan_pts = tuple(
                (x, y) for x in (0.15, 0.35, 0.55) for y in (-0.15, 0.0, 0.15)
            )
            return LaikagoEnv(
                dtype=jnp.float32, terrain=terrain, height_scan=scan_pts
            )

        # per-robot batches are the MEASURED best from tools/batch_sweep.py
        # (round 5, real chip), capped by the TDS_BENCH_BATCH knob so a CPU
        # smoke run (TDS_BENCH_BATCH=64) stays cheap
        for name, mk, b, n in (
            ("ant_scan_rollout_env_steps_per_s", mk_ant,
             min(batch, best_scan_batch["ant"]), scan_len // 2),
            ("humanoid_scan_rollout_env_steps_per_s", mk_humanoid,
             min(max(batch // 4, 1), best_scan_batch["humanoid"]),
             scan_len // 5),
            ("laikago_terrain_scan_rollout_env_steps_per_s", mk_terrain,
             min(batch, best_scan_batch["terrain"]), scan_len // 2),
        ):
            try:
                envelope[name], roof = measure_env(mk, name, b, n)
                for k, v in roof.items():
                    envelope[f"{name}.{k}"] = v
            except Exception as exc:  # keep the headline alive
                envelope[name + "_error"] = str(exc)[:200]
                print(f"# envelope {name} failed: {exc}", file=sys.stderr)

        # end-to-end ARS iterations/s at the flagship recipe (128 dirs x
        # top-32 x 3000-step rollouts on laikago = 768K env-steps/update)
        try:
            from tds_tpu.learn.ars import ARSConfig, init_ars, make_train_step

            acfg = ARSConfig(
                num_directions=int(os.environ.get("TDS_BENCH_ARS_DIRS", 128)),
                rollout_length=int(os.environ.get("TDS_BENCH_ARS_LEN", 3000)),
                top_directions=32,
            )
            astep = make_train_step(env, policy, acfg)
            astate = init_ars(env, policy, jax.random.PRNGKey(3))
            t0 = time.time()
            astate, _m = astep(astate)
            jax.block_until_ready(astate.params)
            ars_compile_s = time.time() - t0
            iters = 3
            t0 = time.time()
            for _ in range(iters):
                astate, _m = astep(astate)
            jax.block_until_ready(astate.params)
            ars_s = (time.time() - t0) / iters
            envelope["ars_laikago_iterations_per_s"] = round(1.0 / ars_s, 3)
            envelope["ars_config"] = (
                f"{acfg.num_directions}dirs x {acfg.rollout_length}steps"
            )
            envelope["ars_laikago_env_steps_per_s"] = round(
                acfg.num_directions * 2 * acfg.rollout_length / ars_s, 1
            )
            print(
                f"# ars-iteration: {ars_s:.3f}s/iter "
                f"compile={ars_compile_s:.1f}s",
                file=sys.stderr,
            )
        except Exception as exc:
            envelope["ars_laikago_error"] = str(exc)[:200]
            print(f"# envelope ars failed: {exc}", file=sys.stderr)

        for k, v in envelope.items():
            print(json.dumps({"metric": k, "value": v}))

    # the driver parses the LAST stdout JSON line as the headline; the
    # envelope rides along as a nested field so it lands in BENCH_r0N.json
    print(
        json.dumps(
            {
                "metric": "laikago_scan_rollout_env_steps_per_s",
                "value": round(rollout_steps_per_s, 1),
                "unit": "steps/s",
                "vs_baseline": round(rollout_steps_per_s / 2.0e5, 3),
                **({"envelope": envelope} if envelope else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
