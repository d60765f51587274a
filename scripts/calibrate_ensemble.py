"""Ensemble-calibration sweep: find an SSR~1 operating point (VERDICT r3 #6).

The spread-skill ratio (ref ``src/utilities/evaluation.py:99-120``) should be
~1 for a calibrated ensemble. The round-3 flagship demonstrated SSR 3.12
(overdispersive cold sampler) and the frontier's naive row 0.56
(underdispersive) — this script sweeps the calibration knobs a user turns
when their SSR is off, all EVAL-TIME (reload the same trained checkpoint):

- ``diffusion.sampling_type`` cold vs naive: cold's stochastic-interpolator
  chain injects spread at every step; naive injects it once.
- ``module.prediction_inputs_noise``: Gaussian noise on the conditioning
  window per member — a direct spread dial (ref ``_base_experiment.py:503``).
- ``diffusion.sampling_schedule``: fewer cold steps = fewer stochastic
  perturbations = less spread (PERF.md frontier).

and one TRAIN-TIME knob (``--dropouts`` retrains both stages): the stage-1
interpolator's MC-dropout rate, the root source of DYffusion's stochasticity
(ref ``enable_interpolator_dropout``, ``dyffusion.py:140-163``).

    python scripts/calibrate_ensemble.py [--epochs 10] [--members 20]
        [--dropouts 0.3 0.15] [--registry DIR]

Prints one JSON row per point + a markdown table; the recommendation is the
point with |log SSR| smallest (closest to 1 multiplicatively).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile

import jax

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

# eval-time sweep points: (label, overrides for the mode=test reload)
EVAL_POINTS = [
    ("cold", []),
    ("cold+every3", ["diffusion.sampling_schedule=every3"]),
    ("naive", ["diffusion.sampling_type=naive"]),
    ("naive+noise0.1", ["diffusion.sampling_type=naive",
                        "module.prediction_inputs_noise=0.1"]),
    ("naive+noise0.2", ["diffusion.sampling_type=naive",
                        "module.prediction_inputs_noise=0.2"]),
    ("naive+noise0.4", ["diffusion.sampling_type=naive",
                        "module.prediction_inputs_noise=0.4"]),
]


def train_two_stage(registry: str, epochs: int, extra) -> str:
    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import run_experiment

    common = SST + [
        f"registry_dir={registry}",
        f"trainer.max_epochs={epochs}",
        f"trainer.val_every_n_epochs={max(epochs // 2, 1)}",
    ] + list(extra)
    cfg1 = get_config("synthetic_interpolation", common)
    trainer1, best1 = run_experiment(cfg1)
    run1 = os.path.basename(trainer1.ckpt.run_dir)
    cfg2 = get_config(
        "synthetic_dyffusion", common + [f"diffusion.interpolator_run_id={run1}"]
    )
    trainer2, best2 = run_experiment(cfg2)
    print(json.dumps({"stage1_best": best1, "stage2_best": best2, "extra": list(extra)}))
    return os.path.basename(trainer2.ckpt.run_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--members", type=int, default=20,
                    help="test ensemble size for the sweep (50 = full test mode)")
    ap.add_argument("--registry", default=None)
    ap.add_argument("--run_id", default=None, help="reuse a trained stage-2 run")
    ap.add_argument("--dropouts", nargs="*", type=float, default=[0.3],
                    help="stage-1/2 block_dropout train points (first reuses "
                         "--run_id if given)")
    args = ap.parse_args()

    from dyffusion_tpu.interface import reload_and_test

    registry = args.registry or tempfile.mkdtemp(prefix="calibration_registry_")
    rows = []
    for di, dropout in enumerate(args.dropouts):
        if di == 0 and args.run_id:
            run2 = args.run_id
        else:
            run2 = train_two_stage(
                registry, args.epochs, [f"model.block_dropout={dropout}"]
            )
        for label, ov in EVAL_POINTS:
            m = reload_and_test(
                registry, run2,
                overrides=ov + [f"module.num_predictions_test={args.members}"],
            )
            row = {
                "point": f"dropout{dropout}/{label}",
                "run": run2,
                "crps": round(m["test/crps"], 5),
                "mse": round(m["test/mse"], 5),
                "ssr": round(m["test/ssr"], 4),
            }
            rows.append(row)
            print(json.dumps(row))

    best = min(rows, key=lambda r: abs(math.log(max(r["ssr"], 1e-9))))
    print("\n| operating point | CRPS | MSE | SSR |")
    print("|---|---|---|---|")
    for r in rows:
        mark = " **<- calibrated**" if r is best else ""
        print(f"| {r['point']} | {r['crps']} | {r['mse']} | {r['ssr']}{mark} |")
    print(json.dumps({"calibrated_point": best, "registry": registry}))


if __name__ == "__main__":
    main()
