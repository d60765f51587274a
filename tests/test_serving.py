"""AOT serving export: jax.export artifact of a trained run's sampler.

The exported artifact must (a) embed the trained weights (no checkpoint or
model code needed at load time), (b) reproduce the in-framework predict
path exactly, and (c) carry a manifest describing the exact I/O contract.
Serving analogue of the reference's test-mode reload (ref ``run.py
mode=test`` + ``src/train.py:44-67``).
"""
import json
import os

import jax
import numpy as np
import pytest

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment
from dyffusion_tpu.serving import build_predict_fn, export_run, load_exported

TINY = [
    "datamodule.n_traj=4",
    "datamodule.n_time=16",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=3",
    "datamodule.batch_size=4",
    "datamodule.eval_batch_size=4",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "model.block_dropout=0.2",
    "module.num_predictions=2",
    "module.num_predictions_test=3",
    "trainer.max_epochs=1",
]


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    registry = str(tmp_path_factory.mktemp("registry"))
    cfg = get_config("synthetic_interpolation", TINY + [f"registry_dir={registry}"])
    trainer, best = run_experiment(cfg)
    assert np.isfinite(best)
    return registry, os.path.basename(trainer.ckpt.run_dir)


def test_export_roundtrip_matches_direct_call(trained_run, tmp_path):
    registry, run_id = trained_run
    predict, specs, info = build_predict_fn(registry, run_id)
    batch = {
        k: np.random.default_rng(0).standard_normal(s.shape).astype(s.dtype)
        for k, s in specs.items()
    }
    seed = np.uint32(123)
    direct = np.asarray(predict(batch, seed))
    # (N, B, T, H, W, C): ensemble members x batch x horizon steps
    assert direct.shape[0] == info["ensemble_members"]
    assert direct.shape[1] == batch["dynamics"].shape[0]
    assert direct.dtype == np.float32

    out_dir = str(tmp_path / "artifact")
    path = export_run(registry, run_id, out_dir)
    assert os.path.exists(path)

    served, manifest = load_exported(out_dir)
    out = np.asarray(served(batch, 123))
    np.testing.assert_allclose(out, direct, rtol=1e-6, atol=1e-6)
    # a different seed must produce a different stochastic ensemble
    assert not np.allclose(np.asarray(served(batch, 7)), direct)


def test_manifest_describes_contract(trained_run, tmp_path):
    registry, run_id = trained_run
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir)
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["run_id"] == run_id
    assert manifest["slot"] == "best"
    # interpolation consumes window + horizon conditioning frames
    assert manifest["dynamics_frames"] == 1 + 3
    dyn = manifest["inputs"]["dynamics"]
    assert dyn["shape"][1] == manifest["dynamics_frames"]
    assert manifest["output"]["shape"][0] == manifest["ensemble_members"]
    assert manifest["seed"] == {"shape": [], "dtype": "uint32"}
    assert jax.default_backend() in manifest["platforms"]


def test_artifact_is_self_contained(trained_run, tmp_path):
    """The artifact directory alone (moved away from the registry and the
    export process) must load and run — weights live inside it."""
    import shutil

    registry, run_id = trained_run
    _, specs, _ = build_predict_fn(registry, run_id)
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir)
    moved = str(tmp_path / "shipped_to_serving_host")
    shutil.copytree(out_dir, moved)
    shutil.rmtree(out_dir)
    batch = {k: np.zeros(s.shape, s.dtype) for k, s in specs.items()}
    served, _ = load_exported(moved)
    out = np.asarray(served(batch, 0))
    assert np.isfinite(out).all()
