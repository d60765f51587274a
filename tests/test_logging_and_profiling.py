"""Logging / profiling utilities."""
import json
import os

import numpy as np

from dyffusion_tpu.utils.logging import MetricsLogger, get_logger, save_arrays_as_line_plot
from dyffusion_tpu.utils.profiling import device_memory_report, timing_scope


def test_metrics_logger_jsonl_and_hparams(tmp_path):
    run_dir = str(tmp_path / "run")
    logger = MetricsLogger(run_dir)
    logger.log_hyperparams({"seed": 1, "model": {"dim": 8}})
    logger.log({"train/loss": 0.5, "val/crps": np.float32(0.2)}, step=10)
    logger.log({"train/loss": 0.4}, step=20)
    logger.finish()
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert len(records) == 2
    assert records[0]["step"] == 10 and abs(records[0]["val/crps"] - 0.2) < 1e-6
    with open(os.path.join(run_dir, "hparams.json")) as f:
        assert json.load(f)["model"]["dim"] == 8


def test_save_arrays_as_line_plot(tmp_path):
    run_dir = str(tmp_path)
    x = np.arange(1, 5)
    metrics = {"crps": np.array([0.4, 0.3, 0.35, 0.5]), "mse": np.ones(4)}
    out_dir = save_arrays_as_line_plot(run_dir, x, metrics, "test/5ens_mems/")
    npz = np.load(os.path.join(out_dir, "test_5ens_mems.npz"))
    np.testing.assert_array_equal(npz["horizon"], x)
    np.testing.assert_array_equal(npz["crps"], metrics["crps"])
    with open(os.path.join(out_dir, "test_5ens_mems.json")) as f:
        table = json.load(f)
    assert table["mse"] == [1.0] * 4


def test_timing_scope_and_memory_report():
    results = {}
    with timing_scope("block", results=results):
        sum(range(1000))
    assert results["block"] >= 0
    report = device_memory_report()
    assert isinstance(report, str) and len(report) > 0


def test_get_logger_singleton_handlers():
    a = get_logger("x")
    b = get_logger("x")
    assert a is b and len(a.handlers) == 1
