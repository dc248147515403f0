"""Mocap motion import + frame blending + n-d dataset container.

Analogs of src/utils/motion_import.hpp:27-132 (DeepMimic-style JSON motion
files with LoopMode/FrameDuration/Frames, linear inter-frame blending) and
src/utils/dataset.hpp (n-dimensional array container — subsumed by jnp
arrays; kept as a thin loader).

The blend is traceable (jnp ops on a (num_frames, dim) array), so motion
targets can be queried inside jitted imitation-learning objectives.
"""

import json
import re
from typing import Optional

import jax.numpy as jnp
import numpy as np

LOOP_CLAMP = 0
LOOP_WRAP = 1


class Motion:
    def __init__(self, frames, frame_duration: float, loop_mode: int = LOOP_WRAP):
        self.frames = jnp.asarray(frames)
        self.frame_duration = float(frame_duration)
        self.loop_mode = loop_mode

    @property
    def total_duration(self) -> float:
        return self.frame_duration * self.frames.shape[0]

    def calculate_frame(self, time):
        """Linear blend of neighboring frames at arbitrary time
        (motion_import.hpp:44-82), branchless/batch-friendly."""
        time = jnp.asarray(time)
        num = self.frames.shape[0]
        # numerically-stable index per the reference (+fd/4 bias)
        n = jnp.floor(
            time / self.frame_duration + self.frame_duration / 4.0
        ).astype(jnp.int32)
        if self.loop_mode == LOOP_CLAMP:
            # clamp mode holds the FINAL frame past the end: clamp the frame
            # index (wrapping it restarted the clip) and the blend weight
            n = jnp.clip(n, 0, num - 1)
            idx_left = n
            idx_right = jnp.minimum(idx_left + 1, num - 1)
            alpha = jnp.clip(
                (time - n * self.frame_duration) / self.frame_duration,
                0.0,
                1.0,
            )
        else:
            idx_left = jnp.mod(n, num)
            idx_right = jnp.mod(idx_left + 1, num)
            alpha = (time - n * self.frame_duration) / self.frame_duration
        left = self.frames[idx_left]
        right = self.frames[idx_right]
        return (1.0 - alpha)[..., None] * left + alpha[..., None] * right

    @staticmethod
    def load_from_file(path: str) -> "Motion":
        """Parses DeepMimic-style motion files; tolerates the loose JSON in
        the reference data (trailing commas)."""
        with open(path) as f:
            text = f.read()
        # strip comments and trailing commas, then parse as JSON
        text = re.sub(r",(\s*[\]}])", r"\1", text)
        data = json.loads(text)
        loop = data.get("LoopMode", "Wrap")
        loop_mode = LOOP_WRAP if "wrap" in str(loop).lower() else LOOP_CLAMP
        frames = np.asarray(data["Frames"], dtype=float)
        frame_duration = float(data.get("FrameDuration", 1.0 / 30.0))
        return Motion(frames, frame_duration, loop_mode)
