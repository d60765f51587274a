"""Sweep launcher: the analogue of Hydra multirun (ref ``run.py:9`` —
``python run.py -m param=a,b,c``). ``-m`` expands comma-valued overrides
cartesian-product style; bracketed tuples keep their commas; each run lands
under its own deterministic run id in the registry for ``registry_api``
analytics (the reference's ``wandb_api.get_runs_df`` workflow)."""
import json
import os

import numpy as np

from dyffusion_tpu.train import _split_sweep_values, expand_multirun, main


def test_split_sweep_values_respects_brackets():
    assert _split_sweep_values("1e-4,3e-4") == ["1e-4", "3e-4"]
    assert _split_sweep_values("(1,2)") == ["(1,2)"]
    assert _split_sweep_values("(1,2),(1,2,4)") == ["(1,2)", "(1,2,4)"]
    assert _split_sweep_values("[60,60]") == ["[60,60]"]
    assert _split_sweep_values("single") == ["single"]


def test_expand_multirun_cartesian_order():
    combos = expand_multirun(["experiment=x", "a=1,2", "b=u,v", "c=(1,2)"])
    assert len(combos) == 4
    assert combos[0] == ["experiment=x", "a=1", "b=u", "c=(1,2)"]
    assert combos[-1] == ["experiment=x", "a=2", "b=v", "c=(1,2)"]
    # no comma values -> single run, args untouched
    assert expand_multirun(["a=1", "b=(1,2)"]) == [["a=1", "b=(1,2)"]]


def test_multirun_end_to_end(tmp_path, capsys):
    """A 2-point lr sweep through the real CLI: two runs train, each under its
    own run id, and the summary reports the sweep's best score."""
    registry = str(tmp_path / "runs")
    args = [
        "-m",
        "experiment=synthetic_interpolation",
        "datamodule.n_traj=3",
        "datamodule.n_time=12",
        "datamodule.spatial=(8,8)",
        "datamodule.channels=1",
        "datamodule.horizon=3",
        "datamodule.batch_size=4",
        "model.dim=8",
        "model.dim_mults=(1,)",
        "module.num_predictions=1",
        "module.optimizer.lr=1e-4,3e-4",
        "trainer.max_epochs=1",
        "trainer.max_steps=2",
        f"registry_dir={registry}",
    ]
    best = main(args)
    assert np.isfinite(best)
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["multirun"] == 2
    assert summary["best"] == best
    assert len(summary["results"]) == 2
    # two distinct run dirs in the registry (the science hash differs by lr)
    run_dirs = [d for d in os.listdir(registry) if os.path.isdir(os.path.join(registry, d))]
    assert len(run_dirs) == 2
