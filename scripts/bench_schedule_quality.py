"""Sampling-schedule DSL speed/quality frontier (VERDICT r2 next #4).

The reference documents the schedule DSL as the sampling-acceleration path
(``configs/diffusion/dyffusion.yaml``: "Accelerate sampling when k > 0";
setter ``dyffusion.py:246-333``) but never quantifies its quality cost. This
script trains a REAL two-stage DYffusion model at the SST scale (60x60 grid,
dim-64 ResNet UNet, h=7, k=25) on the learnable synthetic traveling-wave
data, then evaluates the SAME trained checkpoint under each sampling
schedule through the product ``mode=test`` path (``reload_and_test``),
reporting CRPS / MSE / SSR alongside frames/sec/chip.

    python scripts/bench_schedule_quality.py [--epochs 8] [--registry DIR]

Output: one JSON line per schedule + a markdown table for PERF.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax

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

WORKLOADS = {
    "sst": sst_overrides([
        "datamodule.n_traj=24",
        "datamodule.n_time=60",
        "datamodule.batch_size=64",
        "datamodule.eval_batch_size=6",
        "module.num_predictions_test=20",
        *SST_FAST_EVAL,
    ]),
    # The NS workload where the SST-toy frontier ordering is expected to
    # invert (refine ON, forward_conditioning="none", big grid with the
    # 256x256 internal resample). The reference NS recipe uses k=0 (no
    # auxiliary steps — the DSL has nothing to skip), so the frontier is run
    # at k=8 (the acceleration configuration a user would actually enable
    # the DSL for), plus a k=0 reference row via --schedules.
    "ns": ns_overrides([
        "datamodule.n_traj=12",
        "datamodule.n_time=48",  # train: 7 traj x 32 windows = 224 examples
        "datamodule.batch_size=32",
        "datamodule.eval_batch_size=2",
        "module.num_predictions_test=20",
        "diffusion.additional_interpolation_steps=8",
        *SST_FAST_EVAL,
    ]),
    # Spring-mesh (ref ``configs/experiment/spring_mesh.yaml``): 10x10 grid,
    # C=4+1, SimpleConvNet+BatchNorm, the LONG horizon h=134 — the sampler
    # chain is already 134+ steps, so this probes the DSL where skipping
    # auxiliary steps changes a long rollout, not a short one. The reference
    # spring recipe also uses k=0; as with NS the frontier runs at k=8 so
    # the DSL has steps to skip.
    "spring": spring_overrides([
        "datamodule.n_traj=16",
        "datamodule.n_time=142",  # train split: 9 traj x 8 windows >= batch 64
        "datamodule.batch_size=64",
        "datamodule.eval_batch_size=2",
        "module.num_predictions_test=20",
        "diffusion.additional_interpolation_steps=8",
        *SST_FAST_EVAL,
    ]),
}

# (schedule, sampling_type) points on the speed/quality frontier. 'naive'
# (ref sampling_type, dyffusion.py:335-426) costs ONE interpolator call per
# step instead of cold's two — note cold-with-cached-current-interpolation
# telescopes algebraically to exactly this chain, so naive IS the
# "skip the second interpolator call" acceleration.
POINTS = [
    (None, "cold"),
    ("every2", "cold"),
    ("every3", "cold"),
    ("first0.5", "cold"),
    (None, "naive"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--workload", choices=sorted(WORKLOADS), default="sst")
    ap.add_argument("--registry", default=None)
    ap.add_argument("--run_id", default=None,
                    help="reuse an already-trained stage-2 run in --registry "
                         "(skip the two-stage training)")
    ap.add_argument("--schedules", nargs="*", default=None)
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra key=value overrides appended to the workload")
    args = ap.parse_args()

    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import reload_and_test, run_experiment

    if args.registry is None:
        args.registry = f"/tmp/sched_quality_registry_{args.workload}"
    SST = WORKLOADS[args.workload] + list(args.extra)
    common = SST + [
        f"registry_dir={args.registry}",
        f"trainer.max_epochs={args.epochs}",
        f"trainer.val_every_n_epochs={max(args.epochs // 2, 1)}",
    ]
    if args.run_id:
        run2 = args.run_id
    else:
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

    points = (
        [(s if s != "None" else None, "cold") for s in args.schedules]
        if args.schedules is not None
        else POINTS
    )
    rows = []
    for sched, stype in points:
        ov = [] if sched in (None, "None") else [f"diffusion.sampling_schedule={sched}"]
        if stype != "cold":
            ov.append(f"diffusion.sampling_type={stype}")
        _, trainer = reload_and_test(args.registry, run2, overrides=ov, return_trainer=True)
        m = trainer.test(save_curves=False)  # warm re-run: fps without compile
        n_steps = len(trainer.experiment.engine.sampling_schedule)
        row = {
            "schedule": sched or "full",
            "sampling_type": stype,
            "n_sampler_steps": n_steps,
            "crps": round(m["test/crps"], 5),
            "mse": round(m["test/mse"], 5),
            "ssr": round(m["test/ssr"], 4),
            "frames_per_sec_per_chip": round(m["test/frames_per_sec_per_chip"], 1),
        }
        rows.append(row)
        print(json.dumps(row))

    # markdown table for PERF.md
    print("\n| schedule | type | sampler steps | CRPS | MSE | SSR | frames/s/chip |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['schedule']} | {r['sampling_type']} | {r['n_sampler_steps']} | "
            f"{r['crps']} | {r['mse']} | {r['ssr']} | {r['frames_per_sec_per_chip']} |"
        )


if __name__ == "__main__":
    main()
