#!/usr/bin/env python3
"""Profile the DYffusion SST sampler: FLOPs, bytes, runtime -> MFU.

Runs the same jitted sampler the bench/Trainer eval path uses, pulls XLA's
``cost_analysis`` (FLOPs + bytes accessed) from the compiled executable,
measures steady-state wall time, and prints FLOPs-utilization (MFU) and the
HBM-bandwidth utilization — the data behind PERF.md's roofline discussion
(VERDICT r1 weak #6). Optionally writes a ``jax.profiler`` trace.

    python scripts/profile_sampler.py [--trace /tmp/sampler_trace] [--f32]

TPU v5e peaks (per chip): 197 TFLOP/s bf16, 98.3 TFLOP/s f32 (one MXU),
819 GB/s HBM BW.
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

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.3e12
V5E_HBM_BW = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="directory for a jax.profiler trace")
    ap.add_argument("--f32", action="store_true", help="profile the f32 path instead of bf16")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import build_experiment, get_datamodule
    from dyffusion_tpu.models import make_apply_fn
    from bench import TINY_SST

    overrides = list(TINY_SST)
    if args.f32:
        overrides = [o for o in overrides if not o.startswith("module.eval_dtype")]

    cfg1 = get_config("synthetic_interpolation", overrides)
    dm = get_datamodule(cfg1)
    dm.setup()
    _, ip_model, ip_vars, _, _, _ = build_experiment(cfg1, dm)
    cfg = get_config("synthetic_dyffusion", overrides)
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(
        cfg, dm, interpolator=(make_apply_fn(ip_model), ip_vars)
    )

    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.val_batches())).items()}
    rng = jax.random.key(0)
    fn = jax.jit(eval_fns["val"])

    # FLOPs: XLA's cost_analysis counts a lax.scan BODY ONCE, not per
    # iteration — a whole-graph readout grossly undercounts the sampler.
    # Instead take cost_analysis of ONE forecaster + ONE interpolator forward
    # (unscanned) and multiply by the schedule length.
    members, B, h = 20, 6, 7
    n_steps = len(engine.sampling_schedule)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    fc_apply = engine.forecaster_apply
    ip_apply = engine.interpolator_apply
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
    vars_c = cast(variables)
    ip_vars_c = cast(exp.interpolator_params)
    Bf = members * B
    xf = jnp.ones((Bf, 60, 60, 1), dtype)
    cf = jnp.ones((Bf, 60, 60, 1), dtype)
    tf = jnp.ones((Bf,), jnp.float32)
    xi = jnp.ones((2 * Bf, 60, 60, 2), dtype)
    ti = jnp.ones((2 * Bf,), jnp.float32)

    def _flops(f, *a):
        ca = jax.jit(f).lower(*a).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    fc_fl, fc_by = _flops(lambda v, x, t, c: fc_apply(v, x, t, c, None), vars_c, xf, tf, cf)
    ip_fl, ip_by = _flops(lambda v, x, t: ip_apply(v, x, t, None, None), ip_vars_c, xi, ti)
    # per schedule step (cold sampling): 1 forecaster + 1 fused-2B interpolator
    flops = n_steps * (fc_fl + ip_fl)
    bytes_accessed = n_steps * (fc_by + ip_by)

    def _fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    out = fn(variables, batch, rng)
    _fetch(out)
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = fn(variables, batch, jax.random.fold_in(rng, i))
    _fetch(out)  # real host read: block_until_ready is unreliable on axon
    dt = (time.perf_counter() - t0) / args.iters

    peak = V5E_PEAK_F32 if args.f32 else V5E_PEAK_BF16
    achieved_flops = flops / dt
    achieved_bw = bytes_accessed / dt
    n_frames = 20 * 6 * 7  # members x batch x horizon
    report = {
        "dtype": "f32" if args.f32 else "bf16",
        "wall_time_s": round(dt, 4),
        "frames_per_sec_per_chip": round(n_frames / dt, 1),
        "flops_per_call": flops,
        "bytes_accessed_per_call": bytes_accessed,
        "achieved_tflops": round(achieved_flops / 1e12, 2),
        "mfu_pct": round(100 * achieved_flops / peak, 2),
        "achieved_hbm_gbps": round(achieved_bw / 1e9, 1),
        "hbm_bw_util_pct": round(100 * achieved_bw / V5E_HBM_BW, 2),
        "arithmetic_intensity_flops_per_byte": round(flops / max(bytes_accessed, 1), 2),
    }
    print(json.dumps(report, indent=2))

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = fn(variables, batch, jax.random.fold_in(rng, 999))
            jax.block_until_ready(out)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
