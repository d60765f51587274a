"""Train-step benchmark at real workload scale (VERDICT r2 next #1).

Measures the jitted product ``Trainer.train_step`` (value_and_grad + optax
update + EMA, donated state) for:

- stage-1 interpolation training (ref ``interpolation.py:64-109``),
- stage-2 DYffusion two-term ``p_losses`` training (2 frozen-interpolator +
  2 forecaster forwards + backward; ref ``dyffusion.py:496-567``),
- stage-2 with the bf16 frozen-interpolator lever
  (``diffusion.train_interpolator_dtype=bfloat16``).

at the OISST SST scale (60x60, dim-64 ResNet-attention UNet, train batch 64 —
ref ``configs/experiment/oisst_pacific_dyffusion.yaml``). Reports steps/sec,
examples/sec, and MFU from the compiled step's own cost analysis (the train
step contains no ``lax.scan``, so ``cost_analysis()`` flops are exact — the
sampler-profile caveat does not apply).

Timing ends with a real device->host read (``float(...)``) —
``block_until_ready`` is unreliable on this host (PERF.md).
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

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.3e12

from dyffusion_tpu.utils.workloads import (  # noqa: E402
    ns_overrides,
    spring_overrides,
    sst_overrides,
    time_train_steps,
)

# Per-workload overrides at the REFERENCE train recipes (PERF.md train
# matrix): synthetic data sized so the train split holds >= one batch.
WORKLOADS = {
    "sst": sst_overrides([
        "datamodule.n_traj=16",
        "datamodule.n_time=20",  # train split: 9 traj x 13 windows >= batch 64
        "datamodule.batch_size=64",  # ref oisst_pacific.yaml train batch
        "trainer.save_checkpoints=False",
    ]),
    # ref navier_stokes.yaml: B=32 x accumulate 2 (the accumulation layout is
    # benched separately in bench_fold_remat.py; here one micro-batch step)
    "ns": ns_overrides([
        "datamodule.n_traj=5",
        "datamodule.n_time=30",  # train split: 3 traj x 14 windows >= batch 32
        "datamodule.batch_size=32",
        "trainer.save_checkpoints=False",
    ]),
    # ref spring_mesh.yaml: B=64, horizon 134 (windows need 135 frames)
    "spring": spring_overrides([
        "datamodule.n_traj=16",
        "datamodule.n_time=142",  # train split: 9 traj x 8 windows >= batch 64
        "datamodule.batch_size=64",
        "trainer.save_checkpoints=False",
    ]),
}
DEFAULT_BATCH = {"sst": 64, "ns": 32, "spring": 64}


def _build(preset, overrides, interpolator=None):
    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import build_experiment, create_train_state, get_datamodule

    cfg = get_config(preset, overrides)
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(
        cfg, dm, interpolator=interpolator
    )
    state = create_train_state(cfg, variables)
    batch = {
        k: jnp.asarray(v)
        for k, v in next(iter(dm.train_batches(rng=np.random.default_rng(0)))).items()
    }
    return cfg, dm, model, loss_fn, state, batch


def bench_step(loss_fn, state, batch, steps: int, peak: float):
    from dyffusion_tpu.training.trainer import make_train_step

    train_step = make_train_step(loss_fn)
    # flops of ONE step from the compiled executable (no scan in the step)
    lowered = train_step.lower(state, batch)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    dt = time_train_steps(train_step, state, batch, steps)
    B = int(next(iter(batch.values())).shape[0])
    return {
        "steps_per_sec": round(1.0 / dt, 3),
        "examples_per_sec": round(B / dt, 1),
        "step_ms": round(dt * 1e3, 2),
        "flops_per_step": flops,
        "mfu_pct": round(100 * flops / dt / peak, 2) if flops else None,
        "batch": B,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=None,
                    help="train batch (default: the workload's reference recipe)")
    ap.add_argument("--workload", choices=sorted(WORKLOADS), default="sst")
    ap.add_argument(
        "--stage", choices=["1", "2", "2bf16", "1full", "2full", "all"], default="all"
    )
    args = ap.parse_args()
    if args.batch is None:
        args.batch = DEFAULT_BATCH[args.workload]
    SST = WORKLOADS[args.workload]

    from dyffusion_tpu.models import make_apply_fn

    overrides = [o for o in SST if not o.startswith("datamodule.batch_size")] + [
        f"datamodule.batch_size={args.batch}"
    ]
    peak = V5E_PEAK_BF16 if jax.default_backend() not in ("cpu",) else V5E_PEAK_F32

    results = {}
    cfg1, dm, ip_model, loss1, state1, batch1 = _build("synthetic_interpolation", overrides)
    ip_apply = make_apply_fn(ip_model)
    # deep-copy BEFORE benchmarking: the bench loop donates state1's buffers.
    # model_state (BatchNorm stats for unet_simple/cnn_simple) rides along —
    # the frozen interpolator apply needs the full variables tree
    ip_vars = jax.tree_util.tree_map(
        jnp.array, {"params": state1.params, **state1.model_state}
    )
    if args.stage in ("1", "all"):
        results["stage1_interpolation"] = bench_step(loss1, state1, batch1, args.steps, peak)
        print("stage1:", json.dumps(results["stage1_interpolation"]))

    if args.stage in ("2", "all"):
        _, _, _, loss2, state2, batch2 = _build(
            "synthetic_dyffusion", overrides, interpolator=(ip_apply, ip_vars)
        )
        results["stage2_dyffusion_f32"] = bench_step(loss2, state2, batch2, args.steps, peak)
        print("stage2 f32:", json.dumps(results["stage2_dyffusion_f32"]))

    if args.stage in ("2bf16", "all"):
        _, _, _, loss2b, state2b, batch2b = _build(
            "synthetic_dyffusion",
            overrides + ["diffusion.train_interpolator_dtype=bfloat16"],
            interpolator=(ip_apply, ip_vars),
        )
        results["stage2_dyffusion_bf16_interp"] = bench_step(
            loss2b, state2b, batch2b, args.steps, peak
        )
        print("stage2 bf16-interp:", json.dumps(results["stage2_dyffusion_bf16_interp"]))

    # full mixed-precision training (module.train_dtype=bfloat16): the whole
    # forward/backward in bf16, f32 master params/grads/loss reductions
    from dyffusion_tpu.training.trainer import mixed_precision_loss

    if args.stage in ("1full", "all"):
        _, _, _, loss1f, state1f, batch1f = _build("synthetic_interpolation", overrides)
        results["stage1_full_bf16"] = bench_step(
            mixed_precision_loss(loss1f), state1f, batch1f, args.steps, V5E_PEAK_BF16
        )
        print("stage1 full-bf16:", json.dumps(results["stage1_full_bf16"]))

    if args.stage in ("2full", "all"):
        _, _, _, loss2f, state2f, batch2f = _build(
            "synthetic_dyffusion",
            overrides + ["diffusion.train_interpolator_dtype=bfloat16"],
            interpolator=(ip_apply, ip_vars),
        )
        results["stage2_full_bf16"] = bench_step(
            mixed_precision_loss(loss2f), state2f, batch2f, args.steps, V5E_PEAK_BF16
        )
        print("stage2 full-bf16:", json.dumps(results["stage2_full_bf16"]))

    print(json.dumps({"train_bench": results, "workload": args.workload,
                      "batch": args.batch, "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
