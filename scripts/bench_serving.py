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
        [--keep-artifact DIR] [--workload sst|ns|spring]
    python scripts/bench_serving.py --restart-only DIR   # process-restart cost
        # (fresh process per run, two modes: 'nocache' recompiles every
        #  restart — the load_exported default — and 'cache' enables the
        #  opt-in colocated cache at DIR/xla_cache; on the tunneled host
        #  the cache reload measured SLOWER than recompiling, PERF.md)

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

from dyffusion_tpu.utils.workloads import (  # noqa: E402
    SST_FAST_EVAL,
    ns_overrides,
    spring_overrides,
    sst_overrides,
)

SST = sst_overrides([
    "datamodule.n_traj=24",
    "datamodule.n_time=60",
    "datamodule.batch_size=64",
    "datamodule.eval_batch_size=6",
    *SST_FAST_EVAL,
])

# NS-shaped serving workload (same shapes as scripts/bench_navier_stokes.py:
# 221x42 grid, C=3+2, h=16, UNetSimple dim 64 with the 256x256 internal
# resample, refine on, forward_conditioning=none — the hard boundary case)
NS = ns_overrides([
    "datamodule.n_traj=5",
    "datamodule.n_time=21",
    "datamodule.batch_size=4",
    "datamodule.eval_batch_size=4",
    *SST_FAST_EVAL,
])

# Spring-mesh serving workload (same shapes as scripts/bench_spring_mesh.py:
# 10x10 grid, C=4+1, h=134, SimpleConvNet dim 64 + BatchNorm — the
# dispatch-bound extreme of the serving matrix)
SPRING = spring_overrides([
    "datamodule.n_traj=3",
    "datamodule.n_time=140",
    "datamodule.batch_size=6",
    "datamodule.eval_batch_size=6",
    "model.dropout=0.05",
    "diffusion.forward_conditioning=data",
    "diffusion.use_cold_sampling_for_last_step=False",
    *SST_FAST_EVAL,
])

WORKLOADS = {"sst": SST, "ns": NS, "spring": SPRING}


def _train_two_stage(registry: str, epochs: int, workload: str = "sst") -> str:
    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import run_experiment

    common = WORKLOADS[workload] + [
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

    # pipelined throughput: dispatch every call before reading any result
    # (JAX async dispatch) — the pattern a serving host that overlaps request
    # handling with device work runs at, vs the strictly synchronous
    # latency loop above
    t2 = time.perf_counter()
    outs = [served(batch, i) for i in range(calls)]
    for o in outs:
        np.asarray(o)
    t_pipe = (time.perf_counter() - t2) / calls
    return {
        "artifact_mb": round(size_mb, 1),
        "load_plus_first_call_s": round(t_first, 2),
        "batch": B,
        "latency_p50_ms": round(p50 * 1e3, 1),
        "latency_p90_ms": round(float(np.percentile(lat, 90)) * 1e3, 1),
        "frames_per_sec_per_chip": round(n_members * B * horizon / p50, 1),
        "fps_per_chip_pipelined": round(n_members * B * horizon / t_pipe, 1),
        "platforms": manifest["platforms"],
        "attention_kernel": manifest["attention_kernel"],
    }


def _bench_restart(artifact_dir: str, runs: int) -> dict:
    """Serving-process RESTART cost: each run is a FRESH python process that
    loads the artifact through ``serving.load_exported`` and executes one
    call. Two modes per pass: ``nocache`` restarts recompile the StableHLO
    every time (the ``load_exported`` default); ``cache`` restarts enable
    the colocated persistent compilation cache at ``<artifact>/xla_cache``
    (first cache run compiles + writes, later ones reload the persisted
    executable). Measured 2026-08-20 on the axon-tunneled v5e the CACHE
    LOSES (~55 s recompile vs ~210-280 s reloading the 180 MB executable) —
    which is why it is opt-in; re-run this on your own serving topology.

    The parent process must NOT have initialized the backend (on TPU only
    one process can hold the chip), so the batch is synthesized numpy-only
    from the manifest and the child owns the device."""
    import subprocess

    with open(os.path.join(artifact_dir, "manifest.json")) as f:
        manifest = json.load(f)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snippet = (
        "import json, sys, time\n"
        "import numpy as np\n"
        f"sys.path.insert(0, {repo!r})\n"
        "out_dir = sys.argv[1]\n"
        "use_cache = sys.argv[2] == 'cache'\n"
        "with open(out_dir + '/manifest.json') as f:\n"
        "    manifest = json.load(f)\n"
        "rng = np.random.default_rng(0)\n"
        "batch = {k: rng.standard_normal(\n"
        "             [6 if d == 'b' else d for d in v['shape']]\n"
        "         ).astype(v['dtype'])\n"
        "         for k, v in manifest['inputs'].items()}\n"
        "t0 = time.perf_counter()\n"
        "from dyffusion_tpu.serving import load_exported\n"
        "served, _ = load_exported(out_dir, compilation_cache=use_cache)\n"
        "out = np.asarray(served(batch, 0))\n"
        "assert np.isfinite(out).all()\n"
        "print(json.dumps({'load_plus_first_call_s':\n"
        "                  round(time.perf_counter() - t0, 2)}))\n"
    )

    def run_one(mode: str, i: int) -> float:
        proc = subprocess.run(
            [sys.executable, "-c", snippet, artifact_dir, mode],
            capture_output=True, text=True, timeout=1800,
        )
        assert proc.returncode == 0, f"restart {mode} run {i}:\n{proc.stdout}\n{proc.stderr}"
        t = json.loads(proc.stdout.strip().splitlines()[-1])["load_plus_first_call_s"]
        print(json.dumps({"restart_mode": mode, "run": i, "load_plus_first_call_s": t}))
        return t

    nocache = [run_one("nocache", i) for i in range(runs)]
    cached = [run_one("cache", i) for i in range(runs)]
    return {
        "restart_recompile_s": min(nocache),
        "restart_cache_write_s": cached[0],
        "restart_cache_hit_s": min(cached[1:]) if len(cached) > 1 else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--calls", type=int, default=30)
    ap.add_argument("--registry", default=None)
    ap.add_argument("--run_id", default=None)
    ap.add_argument("--split", default="predict")
    ap.add_argument("--keep-artifact", default=None, metavar="DIR",
                    help="keep the polymorphic artifact here (for --restart-only)")
    ap.add_argument("--restart-only", default=None, metavar="ARTIFACT_DIR",
                    help="measure serving-process restart cost on an existing "
                         "artifact and exit (parent never touches the device)")
    ap.add_argument("--restart-runs", type=int, default=2)
    ap.add_argument("--workload", choices=sorted(WORKLOADS), default="sst")
    args = ap.parse_args()

    if args.restart_only:
        print(json.dumps(_bench_restart(args.restart_only, args.restart_runs)))
        return

    from dyffusion_tpu.interface import reload_trainer
    from dyffusion_tpu.serving import build_predict_fn, export_run

    registry = args.registry or tempfile.mkdtemp(prefix="serving_bench_registry_")
    run_id = args.run_id or _train_two_stage(registry, args.epochs, args.workload)

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
        keep = args.keep_artifact if poly else None
        out_dir = keep or tempfile.mkdtemp(prefix=f"serving_artifact_{flavor}_")
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
            if not keep:
                shutil.rmtree(out_dir, ignore_errors=True)

    print(json.dumps({
        "serving_bench": results,
        "in_framework_fps_per_chip": round(baseline_fps or 0.0, 1),
        "ensemble_members": info["ensemble_members"],
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
