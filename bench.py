"""Benchmark: DYffusion cold-sampling throughput, frames/sec/chip.

The BASELINE.md north-star metric: forecast frames produced per second per
chip by the full DYffusion sampler (forecaster + 2 interpolator forwards per
schedule step, MC-dropout ensemble) at the OISST SST scale (60x60 grid,
horizon 7, k=25 auxiliary steps — ``configs/experiment/oisst_pacific_dyffusion
.yaml``), ensemble members vmapped.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the value stored in ``bench_baseline.json``
(written on first run — the reference repo publishes no numbers, BASELINE.md).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the sampler graph takes minutes to compile on this
# host; cached, repeat runs start in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

from dyffusion_tpu.diffusion import DyffusionConfig, DyffusionEngine
from dyffusion_tpu.models import BackboneSpec, Unet, init_backbone, make_apply_fn

# SST-scale workload (ref configs/experiment/oisst_pacific_dyffusion.yaml)
H = W = 60
C = 1
HORIZON = 7
K_AUX = 25
BATCH = 6  # eval_batch_size
MEMBERS = 20  # val ensemble
DIM = 64


def build():
    ip_spec = BackboneSpec(2 * C, C, 0, (H, W), with_time_emb=True)
    fc_spec = BackboneSpec(C, C, C, (H, W), with_time_emb=True)  # condition = window frame
    mk = dict(dim=DIM, dim_mults=(1, 2, 4), with_time_emb=True, block_dropout=0.3, attn_dropout=0.1)
    interpolator = Unet(num_input_channels=2 * C, num_output_channels=C, **mk)
    forecaster = Unet(num_input_channels=C, num_output_channels=C, num_conditional_channels=C, **mk)
    ip_vars = init_backbone(interpolator, ip_spec, jax.random.key(0))
    fc_vars = init_backbone(forecaster, fc_spec, jax.random.key(1))

    cfg = DyffusionConfig(
        timesteps=HORIZON,
        additional_interpolation_steps=K_AUX,
        num_input_channels=C,
        lambda_reconstruction=0.5,
        lambda_reconstruction2=0.5,
    )
    engine = DyffusionEngine(
        cfg,
        forecaster_apply=make_apply_fn(forecaster),
        interpolator_apply=make_apply_fn(interpolator),
        interpolator_horizon=HORIZON,
    )
    return engine, fc_vars, ip_vars


def main():
    engine, fc_vars, ip_vars = build()
    # bf16 sampling path: 1.76x over fp32 on v5e (MXU-native); ensemble
    # members fold into the batch axis (dropout masks are independent per
    # batch element, so MC-dropout member diversity is preserved). Outputs
    # are cast back to f32 for metrics.
    cast = lambda tree: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), tree)
    fc_b, ip_b = cast(fc_vars), cast(ip_vars)
    B_eff = MEMBERS * BATCH
    cond = jax.random.normal(jax.random.key(2), (B_eff, H, W, C)).astype(jnp.bfloat16)

    @jax.jit
    def sample(rng, cond):
        return engine.sample(fc_b, ip_b, rng, cond).astype(jnp.float32)

    rng = jax.random.key(3)
    # warmup + compile
    out = sample(rng, cond)
    jax.block_until_ready(out)

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = sample(jax.random.fold_in(rng, i), cond)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    frames = MEMBERS * BATCH * HORIZON  # independent forecast frames per sampler call
    fps = frames / dt
    n_chips = max(1, jax.device_count())
    fps_per_chip = fps / n_chips

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = fps_per_chip
        with open(baseline_path, "w") as f:
            json.dump({"value": baseline, "note": "first measured value (round 1)"}, f)

    print(
        json.dumps(
            {
                "metric": "dyffusion_sst_sampling_throughput",
                "value": round(fps_per_chip, 2),
                "unit": "frames/sec/chip (60x60 SST, h=7, k=25, 20-member ensemble, batch 6)",
                "vs_baseline": round(fps_per_chip / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
