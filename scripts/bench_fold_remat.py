"""Fold-accumulation + remat benchmark at SST scale.

The reference's OISST recipe trains with Lightning gradient accumulation
(``configs/experiment/oisst_pacific.yaml``: accumulate_grad_batches=4 at
per-device batch 64 — effective 256). ``probe_train_ceiling.py`` measured that
the dominant 60x60 64->64 train convs DOUBLE their MFU from B64 to B128
(27.1% -> 51.0% f32): the accumulation micro-batch half-fills the MXU's
M-tiling. ``trainer.fold_accumulation_into_batch`` runs the effective batch
physically (one optimizer step per batch — the same gradient, see
``tests/test_fold_accumulation.py``); ``model.remat`` rematerializes blocks so
the 4x activation memory of the folded batch fits HBM.

This script measures all four corners (acc x fold, +/- remat) for stage-1
interpolation and the stage-2 DYffusion two-term ``p_losses`` step, reporting
examples/sec per EFFECTIVE optimizer step, MFU, and the compiled step's
temp-allocation (HBM activation) size. Timing ends with a real device->host
read (PERF.md "measurement pitfalls").
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

V5E_PEAK_F32 = 98.3e12

from dyffusion_tpu.utils.workloads import (  # noqa: E402
    ns_overrides,
    spring_overrides,
    sst_overrides,
    time_train_steps,
)

# enough train rows for the folded effective batch (train split >= eff rows)
WORKLOADS = {
    "sst": sst_overrides([  # ref oisst recipe: B64 x acc 4 (eff 256)
        "datamodule.n_traj=32",
        "datamodule.n_time=20",
        "trainer.save_checkpoints=False",
    ]),
    "ns": ns_overrides([  # ref NS recipe: B32 x acc 2 (eff 64)
        "datamodule.n_traj=8",
        "datamodule.n_time=33",  # train: 4 traj x 17 windows = 68 >= 64
        "trainer.save_checkpoints=False",
    ]),
    "spring": spring_overrides([  # ref spring recipe: B64 x acc 1 (no fold)
        "datamodule.n_traj=16",
        "datamodule.n_time=150",  # train: 9 traj x 16 windows = 144 >= 128
        "trainer.save_checkpoints=False",
    ]),
}
DEFAULTS = {  # (eff_batch, acc) per the reference recipe
    "sst": (256, 4),
    "ns": (64, 2),
    "spring": (128, 2),  # acc 1 in the recipe -> probe a hypothetical 2-fold
}


def _build(preset, overrides, batch_size, accumulate, interpolator=None):
    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import build_experiment, create_train_state, get_datamodule

    cfg = get_config(
        preset,
        overrides + [
            f"datamodule.batch_size={batch_size}",
            f"trainer.accumulate_grad_batches={accumulate}",
        ],
    )
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(
        cfg, dm, interpolator=interpolator
    )
    state = create_train_state(cfg, variables)
    tensors = dm.split("train").tensors
    n = int(next(iter(tensors.values())).shape[0])
    idx = np.arange(batch_size) % n
    batch = {k: jnp.asarray(np.asarray(v)[idx]) for k, v in tensors.items()}
    return model, loss_fn, state, batch


def bench_corner(loss_fn, state, batch, accumulate, steps):
    """examples/sec per EFFECTIVE optimizer step: `accumulate` micro steps of
    B rows each, or one folded step of B rows when accumulate == 1."""
    from dyffusion_tpu.training.trainer import make_train_step

    train_step = make_train_step(loss_fn)
    compiled = train_step.lower(state, batch).compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    mem = {}
    try:
        m = compiled.memory_analysis()
        mem = {
            "temp_mb": round(m.temp_size_in_bytes / 2**20, 1),
            "arg_mb": round(m.argument_size_in_bytes / 2**20, 1),
        }
    except Exception:
        pass

    # steps multiple of accumulate so the timing averages whole cycles
    n_steps = max(steps - steps % accumulate, accumulate)
    dt_micro = time_train_steps(train_step, state, batch, n_steps)
    B = int(next(iter(batch.values())).shape[0])
    eff_rows = B * accumulate
    dt_eff = dt_micro * accumulate
    return {
        "micro_batch": B,
        "accumulate": accumulate,
        "effective_batch": eff_rows,
        "examples_per_sec": round(eff_rows / dt_eff, 1),
        "effective_step_ms": round(dt_eff * 1e3, 2),
        "mfu_pct": round(100 * flops / dt_micro / V5E_PEAK_F32, 2) if flops else None,
        **mem,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--stage", choices=["1", "2", "all"], default="all")
    ap.add_argument("--workload", choices=sorted(WORKLOADS), default="sst")
    ap.add_argument("--eff-batch", type=int, default=None,
                    help="effective batch (default: the workload's reference recipe)")
    ap.add_argument("--acc", type=int, default=None)
    ap.add_argument(
        "--corner",
        choices=["accumulated", "folded", "folded_remat", "accumulated_remat"],
        default=None,
        help="run ONE corner (fresh process => no HBM carry-over between corners)",
    )
    args = ap.parse_args()
    SST = WORKLOADS[args.workload]
    eff_default, acc_default = DEFAULTS[args.workload]
    if args.eff_batch is None:
        args.eff_batch = eff_default
    if args.acc is None:
        args.acc = acc_default

    from dyffusion_tpu.models import make_apply_fn

    micro = args.eff_batch // args.acc
    corners = [
        ("accumulated", dict(batch_size=micro, accumulate=args.acc), []),
        ("folded", dict(batch_size=args.eff_batch, accumulate=1), []),
        ("folded_remat", dict(batch_size=args.eff_batch, accumulate=1), ["model.remat=True"]),
        ("accumulated_remat", dict(batch_size=micro, accumulate=args.acc), ["model.remat=True"]),
    ]

    results = {}
    ip = None
    if args.stage in ("2", "all"):
        ip_model, _, ip_state, _ = _build("synthetic_interpolation", SST, micro, 1)
        # full variables tree: BatchNorm stats (unet_simple/cnn_simple
        # workloads) ride along with the params
        ip = (
            make_apply_fn(ip_model),
            {"params": ip_state.params, **ip_state.model_state},
        )

    for stage, preset in (("stage1", "synthetic_interpolation"), ("stage2", "synthetic_dyffusion")):
        if args.stage not in ("all", stage[-1]):
            continue
        for name, kw, extra in corners:
            if args.corner and name != args.corner:
                continue
            key = f"{stage}_{name}"
            try:
                _, loss_fn, state, batch = _build(
                    preset, SST + extra, interpolator=(ip if stage == "stage2" else None), **kw
                )
                results[key] = bench_corner(loss_fn, state, batch, kw["accumulate"], args.steps)
            except Exception as e:  # OOM at the folded batch is itself a datum
                results[key] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(key, json.dumps(results[key]))

    print(json.dumps({"fold_remat_bench": results, "workload": args.workload,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
