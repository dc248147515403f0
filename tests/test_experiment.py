"""Experiment harness tests."""

import dataclasses
import json
import os
import tempfile


@dataclasses.dataclass
class TrainCfg:
    learning_rate: float = 0.01
    batch_size: int = 64
    env: str = "cartpole"
    use_filter: bool = True


def test_cli_overrides_and_logging():
    from tds_tpu.utils.experiment import Experiment

    with tempfile.TemporaryDirectory() as d:
        exp = Experiment("unit", TrainCfg(), log_root=d)
        cfg = exp.parse_args(["--learning_rate", "0.5", "--batch_size", "128"])
        assert cfg.learning_rate == 0.5
        assert cfg.batch_size == 128
        assert cfg.env == "cartpole"
        exp.start()
        exp.log_metrics(0, {"reward": 1.25})
        exp.log_metrics(1, {"reward": 2.5})
        exp.finish()
        settings = json.load(open(os.path.join(exp.run_dir, "settings.json")))
        assert settings["config"]["learning_rate"] == 0.5
        rows = [
            json.loads(line)
            for line in open(os.path.join(exp.run_dir, "metrics.jsonl"))
        ]
        assert rows[1]["reward"] == 2.5 and rows[1]["step"] == 1
