"""Run-registry query API over a real (tiny) training run."""
import numpy as np
import pytest

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment
from dyffusion_tpu.utils.registry_api import (
    filter_runs,
    get_run_config,
    get_run_metrics,
    get_runs_summary,
    list_runs,
    metrics_of_runs_to_arrays,
)


@pytest.fixture(scope="module")
def registry(tmp_path_factory):
    reg = str(tmp_path_factory.mktemp("registry"))
    cfg = get_config(
        "synthetic_interpolation",
        [
            "datamodule.n_traj=4", "datamodule.n_time=14", "datamodule.spatial=(8,8)",
            "datamodule.channels=1", "datamodule.horizon=3", "datamodule.batch_size=4",
            "model.dim=8", "model.dim_mults=(1,)", "module.num_predictions=2",
            "trainer.max_epochs=1", f"registry_dir={reg}",
        ],
    )
    trainer, best = run_experiment(cfg)
    return reg


def test_registry_queries(registry):
    runs = list_runs(registry)
    assert len(runs) == 1
    rid = runs[0]
    cfg = get_run_config(registry, rid)
    assert cfg["experiment"] == "interpolation"
    assert filter_runs(registry, experiment="interpolation") == [rid]
    assert filter_runs(registry, experiment="dyffusion") == []
    assert filter_runs(registry, seed=cfg["seed"]) == [rid]

    summary = get_runs_summary(registry)
    assert summary[0]["run_id"] == rid
    assert np.isfinite(summary[0]["best_score"])
    assert summary[0]["monitor"] == "val/crps"

    metrics = get_run_metrics(registry, rid)
    assert any("val/crps" in m for m in metrics)
    series = metrics_of_runs_to_arrays(registry, [rid], "val/crps")
    assert len(series[rid]) >= 1
