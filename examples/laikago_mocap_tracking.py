#!/usr/bin/env python
"""Track the laikago sidestep-dance mocap clip with PD control through
contact physics.

The tds_tpu analog of the reference's laikago tracking workload
(data/laikago_tracking_settings.info + src/utils/motion_import.hpp): load
the DeepMimic-style motion file, blend frames at the control rate with
Motion.calculate_frame, and drive the quadruped's 12 joints toward the
blended targets while the MLCP contact solver keeps it on the ground.

The whole rollout is one jitted lax.scan — the motion blend is traceable,
so the mocap query lives inside the compiled step.

Run: PYTHONPATH=. python examples/laikago_mocap_tracking.py
"""

import argparse

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tds_tpu.envs.laikago import LaikagoEnv
from tds_tpu.utils.file_utils import find_file
from tds_tpu.utils.motion_import import Motion


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2500, help="1 kHz sim steps")
    p.add_argument("--speedup", type=float, default=1.0)
    args = p.parse_args()

    motion = Motion.load_from_file(find_file("laikago_dance_sidestep0.txt"))
    print(
        f"motion: {motion.frames.shape[0]} frames x {motion.frames.shape[1]} "
        f"dims, {motion.total_duration:.2f}s, frame_duration="
        f"{motion.frame_duration * 1e3:.1f}ms"
    )

    # dance targets swing wider than the RL action box; open the clamp
    env = LaikagoEnv(dtype=jnp.float64, action_limit=1.2)
    q0, qd0 = env.initial_state(jax.random.PRNGKey(0))
    frames = jnp.asarray(motion.frames, dtype=q0.dtype)
    motion = Motion(frames, motion.frame_duration, motion.loop_mode)
    dt = env.dt

    def step(carry, i):
        q, qd = carry
        t = i.astype(q.dtype) * dt * args.speedup
        target = motion.calculate_frame(t)[7:19]  # skip root pos+quat
        action = target - env.initial_poses
        q, qd = env.sim_step(q, qd, action)
        joint_q = q[..., 6:18]
        err = joint_q - target
        pos, up = env.base_pose_xyz_rpy(q)
        return (q, qd), (jnp.sqrt(jnp.mean(err**2)), pos[2], up)

    (q, qd), (rms, height, up) = jax.lax.scan(
        jax.jit(step), (q0, qd0), jnp.arange(args.steps)
    )

    settle = args.steps // 5  # ignore the initial pose capture transient
    print(f"tracked {args.steps} steps ({args.steps * dt:.1f}s sim)")
    print(f"joint tracking RMS (post-transient): {float(rms[settle:].mean()):.4f} rad")
    print(f"base height mean/min: {float(height.mean()):.3f}/{float(height.min()):.3f} m")
    print(f"upright (up.z) min: {float(up.min()):.3f}")
    ok = (
        float(rms[settle:].mean()) < 0.25
        and float(height.min()) > 0.2
        and float(up.min()) > 0.8
    )
    print("tracking OK" if ok else "tracking FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
