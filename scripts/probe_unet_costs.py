#!/usr/bin/env python3
"""Bisect where the SST sampler time goes: time the full UNet forward and its
submodules (WSConv blocks, linear attention, full attention, resizes) at the
exact sampler shapes, each with cost_analysis FLOPs -> per-module MFU.

Usage: python scripts/probe_unet_costs.py [--dtype bf16]
"""
from __future__ import annotations

import argparse
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

from flax import linen as nn

from dyffusion_tpu.models import BackboneSpec, Unet, init_backbone, make_apply_fn
from dyffusion_tpu.models.modules import Attention, LinearAttention, PreNormResidual
from dyffusion_tpu.models.unet import ResnetBlock

PEAK = {"bf16": 197e12, "f32": 98.3e12}


def _fetch(out):
    """Force a real device->host read: on the (experimental) axon platform
    block_until_ready does not reliably wait, which silently times dispatch
    instead of execution."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench_fn(fn, *args, iters=10):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)  # queue is serial: fetching the last waits for all
    dt = (time.perf_counter() - t0) / iters
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    return dt, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    peak = PEAK[args.dtype]
    B = 120  # 20 members x 6 batch (the folded sampler batch)
    results = {}

    def record(name, dt, flops):
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "gflops": round(flops / 1e9, 1),
            "mfu_pct": round(100 * flops / dt / peak, 2) if flops else None,
        }

    # full interpolator-shaped UNet forward (2B batch in cold sampling)
    spec = BackboneSpec(2, 1, 0, (60, 60), True)
    model = Unet(dim=64, num_input_channels=2, num_output_channels=1,
                 dim_mults=(1, 2, 4), with_time_emb=True)
    variables = init_backbone(model, spec, jax.random.key(0))
    variables = jax.tree_util.tree_map(lambda x: x.astype(dtype), variables)
    apply_fn = make_apply_fn(model)
    x = jnp.ones((2 * B, 60, 60, 2), dtype)
    t = jnp.ones((2 * B,), jnp.float32)
    f = jax.jit(lambda v, x, t: apply_fn(v, x, t, None, None))
    dt, flops = bench_fn(f, variables, x, t)
    record(f"unet_fwd_B{2*B}", dt, flops)

    # per-module probes at the three ladder resolutions
    for (H, W, C) in ((60, 60, 64), (30, 30, 64), (15, 15, 128)):
        xb = jnp.ones((2 * B, H, W, C), dtype)

        attn = PreNormResidual(C, LinearAttention, dict(dim=C, heads=4, dim_head=32, rescale="qkv"))
        av = jax.jit(attn.init)(jax.random.key(0), xb)
        av = jax.tree_util.tree_map(lambda p: p.astype(dtype), av)
        f = jax.jit(lambda v, x: attn.apply(v, x))
        dt, flops = bench_fn(f, av, xb)
        record(f"lin_attn_{H}x{W}x{C}", dt, flops)

        blk = ResnetBlock(dim_out=C, use_time_emb=False)
        bv = jax.jit(blk.init)(jax.random.key(0), xb)
        bv = jax.tree_util.tree_map(lambda p: p.astype(dtype), bv)
        f = jax.jit(lambda v, x: blk.apply(v, x))
        dt, flops = bench_fn(f, bv, xb)
        record(f"resblock_{H}x{W}x{C}", dt, flops)

    # mid full attention at 15x15x256
    xm = jnp.ones((2 * B, 15, 15, 256), dtype)
    mid = PreNormResidual(256, Attention, dict(dim=256, heads=4, dim_head=32))
    mv = jax.jit(mid.init)(jax.random.key(0), xm)
    mv = jax.tree_util.tree_map(lambda p: p.astype(dtype), mv)
    f = jax.jit(lambda v, x: mid.apply(v, x))
    dt, flops = bench_fn(f, mv, xm)
    record("full_attn_15x15x256", dt, flops)

    # downsample / upsample convs
    f = jax.jit(lambda x: jax.image.resize(x, (2 * B, 120, 120, 64), "nearest"))
    dt, flops = bench_fn(f, jnp.ones((2 * B, 60, 60, 64), dtype))
    record("resize_nearest_60to120", dt, flops)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
