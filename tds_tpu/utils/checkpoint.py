"""Checkpoint/resume for training state.

Analog of the reference's ARS weight/trajectory .bin dumps
(ars_learner.h:266-307) and the Experiment JSON logs, upgraded to a full
pytree checkpoint (policy params, optimizer state, observation-filter
moments, PRNG key, iteration counter) with atomic writes.
"""

import json
import os
import pickle
import tempfile
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, metadata: Optional[dict] = None):
    """Atomic pickle of a pytree (device arrays -> host numpy)."""
    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, state
    )
    payload = {"state": host_state, "metadata": metadata or {}}
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str):
    """Returns (state, metadata)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["state"], payload["metadata"]


def save_policy_weights(path: str, params, reward: Optional[float] = None):
    """Flat weight dump naming like '<env>_weights_<reward>.bin'
    (ars_learner.h:266-281)."""
    arr = np.asarray(params, dtype=np.float64)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr.tofile(path)
    meta = {"size": int(arr.size)}
    if reward is not None:
        meta["reward"] = float(reward)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_policy_weights(path: str):
    return np.fromfile(path, dtype=np.float64)
