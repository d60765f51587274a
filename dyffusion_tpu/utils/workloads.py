"""Canonical benchmark workload definitions + the shared step-timing idiom.

One definition of the SST-scale workload (reference
``src/configs/experiment/oisst_pacific_dyffusion.yaml``: 60x60 grid, C=1,
horizon 7, k=25 auxiliary steps, dim-64 ResNet-attention UNet with
mults (1,2,4), 20-member val ensemble) shared by every perf entry point —
``bench.py``, ``scripts/bench_train.py``, ``scripts/bench_schedule_quality
.py``, ``scripts/flagship_run.py`` — so the "same workload" claim the perf
story rests on cannot drift between copies (round-3 review finding).

Split sizes, batch sizes and eval options legitimately differ per purpose
and are passed as ``extra`` overrides by each caller.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

# The model + physics of the SST workload — the keys that define "the same
# workload" across benchmarks. Anything here changes ALL perf entry points.
SST_CORE: Tuple[str, ...] = (
    "datamodule.spatial=(60,60)",
    "datamodule.channels=1",
    "datamodule.horizon=7",
    "model.dim=64",
    "model.dim_mults=(1,2,4)",
    "model.block_dropout=0.3",
    "model.attn_dropout=0.1",
    "module.num_predictions=20",
    "diffusion.additional_interpolation_steps=25",
)

# The matching descriptor for same-workload validation against
# ``scripts/bench_torch_reference.py`` output (see bench.py).
SST_SHAPE: Dict[str, object] = {
    "C": 1, "spatial": 60, "dim": 64, "mults": [1, 2, 4], "horizon": 7, "k_aux": 25,
}

# Fast-eval options (the product path bench.py measures).
SST_FAST_EVAL: Tuple[str, ...] = (
    "module.eval_dtype=bfloat16",
    "module.fold_members_into_batch=True",
)


def sst_overrides(extra: Optional[Sequence[str]] = None) -> List[str]:
    """The canonical SST workload plus caller-specific ``extra`` overrides
    (split sizes, batches, eval options). Later entries win on conflict, so
    extras may override core keys explicitly (e.g. a batch sweep)."""
    return list(SST_CORE) + list(extra or ())


# The Navier-Stokes workload's model + physics (reference
# ``configs/experiment/navier_stokes.yaml:12-16`` + ``model/
# unet_simple_navier_stokes.yaml``): 221x42 grid, C=3 + 2 static condition
# channels, horizon 16, UNetSimple dim 64 with the 256x256 internal bilinear
# resample, train batch 32 x accumulate 2, stage-2 with refine on and
# ``forward_conditioning=none`` (``navier_stokes_dyffusion.yaml:16``).
NS_CORE: Tuple[str, ...] = (
    "datamodule.spatial=(221,42)",
    "datamodule.channels=3",
    "datamodule.conditional_channels=2",
    "datamodule.horizon=16",
    "model.name=unet_simple",
    "model.dim=64",
    "model.outer_sample_mode=bilinear",
    "model.upsample_dims=(256,256)",
    "model.dropout=0.15",
    "module.num_predictions=20",
    "diffusion.refine_intermediate_predictions=True",
    "diffusion.forward_conditioning=none",
)

NS_TRAIN: Tuple[str, ...] = (
    "datamodule.batch_size=32",  # ref navier_stokes.yaml:13
    "trainer.accumulate_grad_batches=2",  # ref navier_stokes.yaml:29
)


def ns_overrides(extra: Optional[Sequence[str]] = None) -> List[str]:
    """The canonical Navier-Stokes workload (see :data:`NS_CORE`)."""
    return list(NS_CORE) + list(extra or ())


# The spring-mesh workload (reference ``configs/experiment/spring_mesh.yaml
# :12-17`` + ``model/cnn_simple.yaml``): 10x10 grid, C=4 + 1 condition
# channel, horizon 134, SimpleConvNet dim 64 with BatchNorm, train batch 64.
SPRING_CORE: Tuple[str, ...] = (
    "datamodule.spatial=(10,10)",
    "datamodule.channels=4",
    "datamodule.conditional_channels=1",
    "datamodule.horizon=134",
    "model.name=cnn_simple",
    "model.dim=64",
    "model.net_normalization=batch_norm",
    "model.dropout=0.2",
    "module.num_predictions=20",
    "diffusion.refine_intermediate_predictions=True",
)

SPRING_TRAIN: Tuple[str, ...] = (
    "datamodule.batch_size=64",  # ref spring_mesh.yaml:13
    "trainer.accumulate_grad_batches=1",  # ref spring_mesh.yaml:28
)


def spring_overrides(extra: Optional[Sequence[str]] = None) -> List[str]:
    """The canonical spring-mesh workload (see :data:`SPRING_CORE`)."""
    return list(SPRING_CORE) + list(extra or ())


def time_train_steps(step_fn, state, batch, steps: int = 20) -> float:
    """Seconds per train step for a jitted ``(state, batch) -> (state,
    metrics)`` step, averaged over ``steps`` after a warmup/compile call.

    Timing ends with a real device->host read (``float(metrics['loss'])``) —
    ``block_until_ready`` is unreliable through the TPU tunnel (PERF.md
    "measurement pitfalls")."""
    state, metrics = step_fn(state, batch)  # warmup/compile
    float(metrics["loss"])  # device sync
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])  # real device->host read ends the timing
    return (time.perf_counter() - t0) / steps
