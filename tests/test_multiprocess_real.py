"""REAL multi-process execution of the normal driver (VERDICT r2 next #3).

Spawns two OS processes that each hold 2 virtual CPU devices, initialize
``jax.distributed`` through the product path
(``run_experiment`` -> ``parallel.distributed.init_distributed`` reading the
JAX_* env vars — the analogue of the reference's NODE_RANK handling,
``config_utils.py:305``), and train the tiny stage-1 workload on a 4-device
mesh where each host feeds only its process-local batch rows
(``parallel.mesh.put_array`` -> ``jax.make_array_from_process_local_data``).

The 2-process result must match a single-process 4-device run to fp
tolerance: same seeds => same shuffle permutation on every host (the
DistributedSampler seed contract), same global batches, same math.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_ARGS = [
    "datamodule.n_traj=4",
    "datamodule.n_time=14",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=4",
    "datamodule.batch_size=1",  # per-device -> global 4 on the 4-device mesh
    "datamodule.eval_batch_size=4",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "model.block_dropout=0.2",
    "module.num_predictions=2",
    "trainer.max_epochs=1",
    "trainer.max_steps=3",
    "trainer.devices=4",
    "trainer.save_checkpoints=False",
]

WORKER = r"""
import json, os, sys
cfg_overrides = json.loads(sys.argv[1])
out_path = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment

cfg = get_config("synthetic_interpolation", cfg_overrides)
trainer, best = run_experiment(cfg)
if jax.process_index() == 0:
    rec = {
        "best": float(best),
        "loss_epoch": float(trainer.history[-1]["train/loss_epoch"]),
        "n_processes": jax.process_count(),
        "n_devices": jax.device_count(),
        "mesh_data": int(trainer.mesh.shape["data"]) if trainer.mesh else 0,
        "mesh_model": int(trainer.mesh.shape.get("model", 1)) if trainer.mesh else 0,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_worker(env_extra, overrides, out_path, n_local_devices):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local_devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-c", WORKER, json.dumps(overrides), out_path],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_driver_matches_single_process(tmp_path):
    overrides = TINY_ARGS + [f"registry_dir={tmp_path}/reg"]

    # --- single-process, 4 virtual devices ---
    single_out = str(tmp_path / "single.json")
    p = _run_worker({}, overrides, single_out, n_local_devices=4)
    out, _ = p.communicate(timeout=900)
    assert p.returncode == 0, f"single-process worker failed:\n{out[-4000:]}"
    single = json.load(open(single_out))
    assert single["n_processes"] == 1 and single["n_devices"] == 4

    # --- two processes x 2 local devices, same global mesh of 4 ---
    port = _free_port()
    multi_out = str(tmp_path / "multi.json")
    procs = []
    for pid in (0, 1):
        env = {
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }
        procs.append(
            _run_worker(env, overrides + [f"registry_dir={tmp_path}/reg2"],
                        multi_out, n_local_devices=2)
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"multi-process worker failed:\n{out[-4000:]}"
    multi = json.load(open(multi_out))
    assert multi["n_processes"] == 2 and multi["n_devices"] == 4
    assert multi["mesh_data"] == 4 == single["mesh_data"]

    # identical data order + replicated state => same losses to fp tolerance
    np.testing.assert_allclose(multi["loss_epoch"], single["loss_epoch"], rtol=1e-4)
    np.testing.assert_allclose(multi["best"], single["best"], rtol=1e-3)


def test_two_process_spatial_sharding_matches_single_process(tmp_path):
    """Multi-process + SPATIAL sharding: mesh (data=1, model=4) over 2
    processes x 2 devices — each process owns only HALF the spatial H axis,
    so ``put_array`` must feed ``make_array_from_process_local_data`` the
    process-local H box (``process_local_box``), not just a row slice."""
    overrides = TINY_ARGS + [
        "trainer.spatial_shards=4",
        f"registry_dir={tmp_path}/reg_sp",
    ]

    single_out = str(tmp_path / "single_sp.json")
    p = _run_worker({}, overrides, single_out, n_local_devices=4)
    out, _ = p.communicate(timeout=900)
    assert p.returncode == 0, f"single-process spatial worker failed:\n{out[-4000:]}"
    single = json.load(open(single_out))
    assert single["mesh_model"] == 4 and single["mesh_data"] == 1

    port = _free_port()
    multi_out = str(tmp_path / "multi_sp.json")
    procs = []
    for pid in (0, 1):
        env = {
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }
        procs.append(
            _run_worker(env, overrides + [f"registry_dir={tmp_path}/reg_sp2"],
                        multi_out, n_local_devices=2)
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"multi-process spatial worker failed:\n{out[-4000:]}"
    multi = json.load(open(multi_out))
    assert multi["n_processes"] == 2 and multi["mesh_model"] == 4

    np.testing.assert_allclose(multi["loss_epoch"], single["loss_epoch"], rtol=1e-4)
    np.testing.assert_allclose(multi["best"], single["best"], rtol=1e-3)
