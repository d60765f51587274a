#!/usr/bin/env python3
"""Spring-mesh workload sampler throughput (PERF.md third benchmark).

Same shape as the reference spring-mesh config (10x10 grid, C=4 +1 condition
channel, horizon 134 -> 804 prediction horizon = 6 AR windows, SimpleConvNet
dim 64 with BatchNorm; ref ``configs/experiment/spring_mesh.yaml:12-17`` + ``model/cnn_simple.yaml:7``,
``dataset_dimensions.py:15-17``), through the product ``Trainer.evaluate``
path (bf16 + member folding + streaming metrics).

    python scripts/bench_spring_mesh.py
"""
from __future__ import annotations

import json
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

SM = [
    "datamodule.n_traj=3",
    # val split: 1 trajectory, 140-135+1 = exactly 6 windows = ONE full eval
    # batch (folded ensemble batch 6*20=120). Measured: the bigger 16-window
    # (320-fold) batch is SLOWER (21.2k vs 22.5k fps) — at 10x10 the extra
    # rows only lengthen each dispatch without improving utilization.
    "datamodule.n_time=140",
    "datamodule.spatial=(10,10)",
    "datamodule.channels=4",
    "datamodule.conditional_channels=1",
    "datamodule.horizon=134",
    "datamodule.batch_size=6",
    "datamodule.eval_batch_size=6",
    "model.name=cnn_simple",
    "model.dim=64",  # ref model/cnn_simple.yaml:7
    "model.net_normalization=batch_norm",
    "model.dropout=0.05",
    "module.num_predictions=20",
    "module.eval_dtype=bfloat16",
    "module.fold_members_into_batch=True",
    "diffusion.refine_intermediate_predictions=True",
    "diffusion.forward_conditioning=data",  # ref spring_mesh_dyffusion.yaml
    "diffusion.use_cold_sampling_for_last_step=False",
    "trainer.save_checkpoints=False",
]


def main():
    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import build_experiment, create_train_state, get_datamodule
    from dyffusion_tpu.models import make_apply_fn
    from dyffusion_tpu.training.trainer import Trainer

    overrides = list(SM)
    cfg1 = get_config("synthetic_interpolation", overrides)
    dm = get_datamodule(cfg1)
    dm.setup()
    _, ip_model, ip_vars, _, _, _ = build_experiment(cfg1, dm)
    cfg = get_config("synthetic_dyffusion", overrides)
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(
        cfg, dm, interpolator=(make_apply_fn(ip_model), ip_vars)
    )
    state = create_train_state(cfg, variables)
    trainer = Trainer(
        experiment=exp, datamodule=dm, state=state, loss_fn=loss_fn,
        eval_fns=eval_fns, run_dir="/tmp/bench_sm_unused", save_checkpoints=False, seed=3,
    )
    trainer.evaluate("val")  # warmup/compile
    best = 0.0
    for _ in range(3):
        m = trainer.evaluate("val")
        best = max(best, m["val/frames_per_sec_per_chip"])
    print(json.dumps({
        "metric": "dyffusion_spring_mesh_sampling_throughput",
        "value": round(best, 2),
        "unit": "frames/sec/chip (10x10 spring-mesh, h=134, refine on, 20-member ensemble, batch 6; Trainer.evaluate)",
    }))


if __name__ == "__main__":
    main()
