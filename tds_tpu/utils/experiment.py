"""Experiment harness: CLI flags + structured JSON logging + run directories.

Analog of src/utils/experiment.hpp:34-421 (cxxopts CLI, nlohmann-json
settings tree, ./logs/<name> persistence): a dataclass-driven config that
round-trips through argparse and JSON, a run directory with settings +
metric logs, and reproducibility metadata (git commit, jax versions,
devices).
"""

import argparse
import dataclasses
import datetime
import json
import os
import subprocess
import time
from typing import Any, Dict, Optional


def _flatten(prefix, obj, out):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        obj = dataclasses.asdict(obj)
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(f"{prefix}{k}." if prefix else f"{k}.", v, out) if isinstance(
                v, dict
            ) else out.update({f"{prefix}{k}": v})
    return out


class Experiment:
    def __init__(self, name: str, config: Any = None, log_root: str = "./logs"):
        self.name = name
        self.config = config
        self.log_root = log_root
        self._stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        self._metrics_file = None
        self._t0 = time.time()

    @property
    def run_dir(self):
        # derived from the CURRENT name: callers may rename after
        # construction but before start() (e.g. laikago_ars -> ant_ars
        # once --env is parsed)
        return os.path.join(self.log_root, self.name, self._stamp)

    # ---- CLI ----------------------------------------------------------
    def parse_args(self, argv=None):
        """Expose every (flattened) config field as a --flag; returns the
        updated config (experiment.hpp's cxxopts tree analog)."""
        if self.config is None:
            return None
        parser = argparse.ArgumentParser(prog=self.name)
        flat = _flatten("", self.config, {})
        for key, val in flat.items():
            if isinstance(val, bool):
                parser.add_argument(f"--{key}", type=lambda s: s.lower() in ("1", "true", "yes"), default=val)
            elif isinstance(val, (int, float, str)):
                parser.add_argument(f"--{key}", type=type(val), default=val)
        args = vars(parser.parse_args(argv))
        # write back into a (possibly nested) dataclass
        def rebuild(cfg, prefix=""):
            if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
                updates = {}
                for f in dataclasses.fields(cfg):
                    key = f"{prefix}{f.name}"
                    val = getattr(cfg, f.name)
                    if dataclasses.is_dataclass(val):
                        updates[f.name] = rebuild(val, key + ".")
                    elif key in args:
                        updates[f.name] = args[key]
                return dataclasses.replace(cfg, **updates)
            return cfg

        self.config = rebuild(self.config)
        return self.config

    # ---- run lifecycle -------------------------------------------------
    def start(self):
        os.makedirs(self.run_dir, exist_ok=True)
        meta = {
            "name": self.name,
            "started": datetime.datetime.now().isoformat(),
            "git_commit": _git_commit(),
        }
        try:
            import jax

            meta["jax_version"] = jax.__version__
            meta["devices"] = [str(d) for d in jax.devices()]
        except Exception:
            pass
        if self.config is not None:
            cfg = (
                dataclasses.asdict(self.config)
                if dataclasses.is_dataclass(self.config)
                else dict(self.config)
            )
            meta["config"] = cfg
        with open(os.path.join(self.run_dir, "settings.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
        self._metrics_file = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
        return self

    def log_metrics(self, step: int, metrics: Dict[str, Any]):
        row = {"step": step, "t": round(time.time() - self._t0, 3)}
        row.update({k: float(v) for k, v in metrics.items()})
        self._metrics_file.write(json.dumps(row) + "\n")
        self._metrics_file.flush()

    def finish(self):
        if self._metrics_file:
            self._metrics_file.close()
            self._metrics_file = None


def _git_commit() -> Optional[str]:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, timeout=5
            )
            .stdout.decode()
            .strip()
            or None
        )
    except Exception:
        return None
