"""Serving-artifact latency/throughput benchmark (PERF.md serving table).

Trains the canonical SST-scale two-stage DYffusion model (or reuses
``--registry``/``--run_id``), exports the stage-2 sampler with
``serving.export_run`` in both artifact flavors — polymorphic-batch (XLA
attention, any B) and static-batch (Pallas attention kept on TPU) — and
measures on the current backend:

- artifact size, load+first-call (compile) time,
- steady-state call latency p50/p90 at the eval batch,
- ensemble-frames/sec/chip through the artifact, vs the in-framework
  ``Trainer.evaluate`` product path on the same checkpoint.

    python scripts/bench_serving.py [--epochs 10] [--registry DIR --run_id ID]

Timing ends with a real device->host read (``np.asarray``) —
``block_until_ready`` is unreliable through the TPU tunnel (PERF.md).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from dyffusion_tpu.utils.workloads import SST_FAST_EVAL, sst_overrides  # noqa: E402

SST = sst_overrides([
    "datamodule.n_traj=24",
    "datamodule.n_time=60",
    "datamodule.batch_size=64",
    "datamodule.eval_batch_size=6",
    *SST_FAST_EVAL,
])


def _train_two_stage(registry: str, epochs: int) -> str:
    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import run_experiment

    common = SST + [
        f"registry_dir={registry}",
        f"trainer.max_epochs={epochs}",
        f"trainer.val_every_n_epochs={max(epochs // 2, 1)}",
    ]
    cfg1 = get_config("synthetic_interpolation", common)
    trainer1, best1 = run_experiment(cfg1)
    run1 = os.path.basename(trainer1.ckpt.run_dir)
    print(json.dumps({"stage1_best_crps": best1, "run": run1}))
    cfg2 = get_config(
        "synthetic_dyffusion", common + [f"diffusion.interpolator_run_id={run1}"]
    )
    trainer2, best2 = run_experiment(cfg2)
    run2 = os.path.basename(trainer2.ckpt.run_dir)
    print(json.dumps({"stage2_best_crps": best2, "run": run2}))
    return run2


def _bench_artifact(out_dir: str, specs, n_members: int, horizon: int, calls: int):
    from dyffusion_tpu.serving import load_exported

    size_mb = os.path.getsize(os.path.join(out_dir, "sampler.jaxexport")) / 2**20
    t0 = time.perf_counter()
    served, manifest = load_exported(out_dir)
    batch = {
        k: np.random.default_rng(0).standard_normal(s.shape).astype(s.dtype)
        for k, s in specs.items()
    }
    first = np.asarray(served(batch, 0))  # load + compile + first execution
    t_first = time.perf_counter() - t0
    B = first.shape[1]

    lat = []
    for i in range(calls):
        t1 = time.perf_counter()
        np.asarray(served(batch, i))  # device->host read ends the timing
        lat.append(time.perf_counter() - t1)
    lat = np.asarray(lat)
    p50 = float(np.percentile(lat, 50))
    return {
        "artifact_mb": round(size_mb, 1),
        "load_plus_first_call_s": round(t_first, 2),
        "batch": B,
        "latency_p50_ms": round(p50 * 1e3, 1),
        "latency_p90_ms": round(float(np.percentile(lat, 90)) * 1e3, 1),
        "frames_per_sec_per_chip": round(n_members * B * horizon / p50, 1),
        "platforms": manifest["platforms"],
        "attention_kernel": manifest["attention_kernel"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--calls", type=int, default=30)
    ap.add_argument("--registry", default=None)
    ap.add_argument("--run_id", default=None)
    ap.add_argument("--split", default="predict")
    args = ap.parse_args()

    from dyffusion_tpu.interface import reload_trainer
    from dyffusion_tpu.serving import build_predict_fn, export_run

    registry = args.registry or tempfile.mkdtemp(prefix="serving_bench_registry_")
    run_id = args.run_id or _train_two_stage(registry, args.epochs)

    # in-framework baseline: the product Trainer.evaluate path (warm run)
    trainer = reload_trainer(registry, run_id)
    trainer.evaluate("predict")  # warmup/compile
    m = trainer.evaluate("predict")
    baseline_fps = m.get("predict/frames_per_sec_per_chip")
    print(json.dumps({"in_framework_fps_per_chip": round(baseline_fps or 0.0, 1)}))

    _, specs, info = build_predict_fn(registry, run_id, split=args.split)
    horizon = None  # read from the first artifact's output spec below

    results = {}
    for flavor, poly in (("polymorphic", True), ("static", False)):
        out_dir = tempfile.mkdtemp(prefix=f"serving_artifact_{flavor}_")
        try:
            t0 = time.perf_counter()
            export_run(registry, run_id, out_dir, split=args.split,
                       polymorphic_batch=poly)
            t_export = time.perf_counter() - t0
            with open(os.path.join(out_dir, "manifest.json")) as f:
                manifest = json.load(f)
            horizon = int(manifest["output"]["shape"][2])
            row = _bench_artifact(
                out_dir, specs, info["ensemble_members"], horizon, args.calls
            )
            row["export_s"] = round(t_export, 1)
            results[flavor] = row
            print(flavor, json.dumps(row))
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    print(json.dumps({
        "serving_bench": results,
        "in_framework_fps_per_chip": round(baseline_fps or 0.0, 1),
        "ensemble_members": info["ensemble_members"],
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
