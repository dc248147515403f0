"""Motion import + frame blending vs the reference semantics.

Covers src/utils/motion_import.hpp:27-132: LoopMode wrap/clamp, the
+fd/4-biased blend index, linear interpolation, and the bundled
laikago_dance_sidestep0.txt mocap asset (19-dim frames: root pos 3,
root quat 4, 12 joint angles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.utils.file_utils import find_file
from tds_tpu.utils.motion_import import LOOP_CLAMP, LOOP_WRAP, Motion


def _reference_blend(frames, frame_duration, loop_mode, time):
    """Direct port of motion_import.hpp:44-82 as an oracle."""
    n = int(np.floor(time / frame_duration + frame_duration / 4.0))
    num = len(frames)
    idx_left = n % num
    idx_right = idx_left + 1
    if idx_right == num:
        idx_right = idx_left if loop_mode == LOOP_CLAMP else 0
    alpha = (time - n * frame_duration) / frame_duration
    return (1.0 - alpha) * np.asarray(frames[idx_left]) + alpha * np.asarray(
        frames[idx_right]
    )


@pytest.fixture(scope="module")
def dance():
    return Motion.load_from_file(find_file("laikago_dance_sidestep0.txt"))


def test_load_bundled_mocap(dance):
    assert dance.frames.shape == (208, 19)
    assert dance.loop_mode == LOOP_WRAP
    assert dance.frame_duration == pytest.approx(1.0 / 24.0)
    assert dance.total_duration == pytest.approx(208 / 24.0)
    # root height column is plausible (laikago standing ~0.44 m)
    assert 0.2 < float(dance.frames[:, 2].mean()) < 0.6


def test_calculate_frame_matches_reference_blend(dance):
    frames = np.asarray(dance.frames)
    fd = dance.frame_duration
    rng = np.random.RandomState(0)
    times = np.concatenate(
        [
            rng.uniform(0.0, dance.total_duration * 1.5, size=32),
            [0.0, fd, 2.5 * fd, dance.total_duration - fd / 2],
        ]
    )
    for t in times:
        want = _reference_blend(frames, fd, LOOP_WRAP, t)
        got = np.asarray(dance.calculate_frame(t))
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=f"t={t}")


def test_loop_modes():
    frames = np.arange(8.0).reshape(4, 2) * np.array([1.0, 10.0])
    fd = 0.5
    wrap = Motion(frames, fd, LOOP_WRAP)
    clamp = Motion(frames, fd, LOOP_CLAMP)
    # midpoint between last and (wrap: first | clamp: last) frame
    t = 3 * fd + fd / 2
    np.testing.assert_allclose(
        wrap.calculate_frame(t), 0.5 * (frames[3] + frames[0]), atol=1e-12
    )
    np.testing.assert_allclose(
        clamp.calculate_frame(t), frames[3], atol=1e-12
    )
    # exact frame hits
    for i in range(4):
        np.testing.assert_allclose(
            wrap.calculate_frame(i * fd), frames[i], atol=1e-9
        )


def test_calculate_frame_traceable_and_batched(dance):
    """The blend is jnp-traceable: jit + batched time queries (used inside
    imitation objectives)."""
    times = jnp.linspace(0.0, dance.total_duration, 17)
    batched = jax.jit(dance.calculate_frame)(times)
    assert batched.shape == (17, 19)
    single = np.stack([np.asarray(dance.calculate_frame(t)) for t in times])
    np.testing.assert_allclose(np.asarray(batched), single, atol=1e-12)

    # differentiable in time (piecewise-linear => derivative is frame diff)
    g = jax.grad(lambda t: dance.calculate_frame(t)[2])(0.7 * dance.frame_duration)
    fd = dance.frame_duration
    want = (dance.frames[1, 2] - dance.frames[0, 2]) / fd
    np.testing.assert_allclose(float(g), float(want), atol=1e-9)
