"""Grouped-conv channel-packing probe (round 3: last layout idea for the
lane-fill ceiling).

``probe_conv_ceiling.py`` proved the sampler's dominant 60x60 64->64 convs
run at 46.8% MFU because 64 output channels half-fill the 128-wide MXU tile
(the reference model's width — ``src/configs/model/unet_resnet.yaml``
dim=64 — is fixed, so padding cannot help). One layout remains untested:
fold pairs of ensemble members into CHANNEL groups instead of batch rows —
B=240 C=64 dense == B=120 C=128 with ``feature_group_count=2`` (identical
FLOPs, block-diagonal weights). IF XLA's TPU emitter packs the two groups
across the 128 lanes, the grouped form would double lane fill and halve
conv time; if it lowers groups to per-group dense convs, it measures the
same (or worse, from the extra relayout).

Timing ends with a real device->host read (PERF.md pitfalls).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

V5E_PEAK_BF16 = 197e12


def time_fn(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def stack(groups: int, n_layers: int = 8):
    @jax.jit
    def run(x, w):
        for _ in range(n_layers):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            )
        return x

    return run


def main():
    B0, H, W, C0 = 240, 60, 60, 64  # the sampler's fused-2B level-1 shape
    flops = 8 * 2 * B0 * H * W * 3 * 3 * C0 * C0  # identical for all packings
    for groups in (1, 2, 4):
        B, C = B0 // groups, C0 * groups
        x = jnp.ones((B, H, W, C), jnp.bfloat16)
        # HWIO with feature_group_count=g: in-channels C/g, out-channels C
        w = jnp.ones((3, 3, C // groups, C), jnp.bfloat16) * 0.01
        dt = time_fn(stack(groups), x, w)
        print(json.dumps({
            "packing": f"B{B} {H}x{W} C{C} groups={groups}",
            "ms_per_8convs": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
            "mfu_pct": round(100 * flops / dt / V5E_PEAK_BF16, 1),
        }))


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
