"""Smoke the one-command experiment DAG (infer -> eval).

Mirrors the reference's SLURM dependency chain
(`infer_eval_scripts/infer_eval_anet.sh:23-31`): one command must take a
task from annotations to printed metrics. Round-1 gap: `anet` was missing
from the runner's choices even though the infer driver supported it.
"""

import pytest

from grove_tpu.tools.run_experiment import TASKS, main


def test_all_reference_tasks_offered():
    assert set(TASKS) == {"iground", "vidstg", "anet", "groundingyoutube",
                          "youcookinteractions"}


@pytest.mark.slow
def test_anet_dag_synthetic(tmp_path):
    metrics = main(["--task", "anet", "--synthetic", "--model_size", "tiny",
                    "--workdir", str(tmp_path), "--max_new_tokens", "6"])
    assert metrics is not None
    assert 0.0 <= metrics["localization_accuracy"] <= 1.0
    assert {"precision_all", "recall_all", "f1_all"} <= set(metrics)
    assert (tmp_path / "anet_predictions.pkl").exists()


@pytest.mark.slow
def test_pointing_dag_synthetic(tmp_path):
    metrics = main(["--task", "groundingyoutube", "--synthetic",
                    "--model_size", "tiny", "--workdir", str(tmp_path)])
    assert metrics is not None
    assert 0.0 <= metrics["pointing_accuracy"] <= 100.0
