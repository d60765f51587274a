"""Int8 MXU rate probe at sampler shapes (round 3 perf exploration).

TPU v5e's MXU runs int8 at 2x the bf16 rate (394.7 TOPS vs 197.2 TFLOP/s
peak). PERF.md's round-3 ceiling analysis pinned the SST sampler at the
conv shape-efficiency ceiling (46.8% MFU for 60x60 64->64 bf16 convs), with
only ALGORITHMIC levers left. Int8 quantization is the one remaining
HARDWARE lever: if XLA emits native int8 convs at these shapes, a
quantized sampler could halve conv time.

This probe answers the go/no-go question only: measured ms for an int8
conv stack (int8 inputs/weights, int32 accumulation via
preferred_element_type) vs the bf16 stack at the sampler's shapes. It does
NOT measure quality — that is the follow-up if the rate materializes.

Timing ends with a real device->host read (block_until_ready unreliable
through the tunnel, PERF.md).
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
V5E_PEAK_INT8 = 394.7e12


def time_fn(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def conv_stack(dtype, acc, n_layers=8):
    @jax.jit
    def run(x, w, w_back):
        for i in range(n_layers):
            y = jax.lax.conv_general_dilated(
                x, w if i % 2 == 0 else w_back, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            # requantize back to the input dtype so the stack composes the
            # way a real quantized network would (shift >> 7 as a stand-in
            # for the per-channel rescale)
            if dtype == jnp.int8:
                x = (y >> 7).astype(jnp.int8)
            else:
                x = y.astype(dtype)
        return x

    return run


def probe(B, H, W, Cin, Cout):
    out = {}
    for name, dtype, acc, peak in [
        ("bf16", jnp.bfloat16, jnp.float32, V5E_PEAK_BF16),
        ("int8", jnp.int8, jnp.int32, V5E_PEAK_INT8),
    ]:
        run = conv_stack(dtype, acc)
        if dtype == jnp.int8:
            x = jnp.ones((B, H, W, Cin), jnp.int8)
            w = jnp.ones((3, 3, Cin, Cout), jnp.int8)
            w_back = jnp.ones((3, 3, Cout, Cin), jnp.int8)
        else:
            x = jnp.ones((B, H, W, Cin), dtype)
            w = jnp.ones((3, 3, Cin, Cout), dtype) * 0.01
            w_back = jnp.ones((3, 3, Cout, Cin), dtype) * 0.01
        try:
            dt = time_fn(run, x, w, w_back)
        except Exception as e:  # pragma: no cover - probe robustness
            out[name] = f"FAILED: {type(e).__name__}: {str(e)[:120]}"
            continue
        flops = 8 * 2 * B * H * W * 3 * 3 * Cin * Cout
        out[name] = {
            "ms": round(dt * 1e3, 3),
            "tops": round(flops / dt / 1e12, 1),
            "util_pct": round(100 * flops / dt / peak, 1),
        }
    row = {"shape": f"B{B} {H}x{W} {Cin}->{Cout}", **out}
    if isinstance(out.get("bf16"), dict) and isinstance(out.get("int8"), dict):
        row["int8_speedup"] = round(out["bf16"]["ms"] / out["int8"]["ms"], 2)
    print(json.dumps(row))


def probe_matmul():
    """Same question for plain dot_general (attention/dense shapes)."""
    M = N = K = 2048
    for name, dtype, acc in [("bf16", jnp.bfloat16, jnp.float32), ("int8", jnp.int8, jnp.int32)]:
        a = jnp.ones((M, K), dtype)
        b = jnp.ones((K, N), dtype)

        @jax.jit
        def run(a, b):
            x = a
            for _ in range(8):
                y = jax.lax.dot_general(
                    x, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
                )
                x = (y >> 11).astype(jnp.int8) if dtype == jnp.int8 else y.astype(dtype)
            return x

        try:
            dt = time_fn(run, a, b)
        except Exception as e:  # pragma: no cover
            print(json.dumps({"matmul_2048": name, "error": str(e)[:120]}))
            continue
        flops = 8 * 2 * M * N * K
        print(json.dumps({"matmul_2048": name, "ms": round(dt * 1e3, 3),
                          "tops": round(flops / dt / 1e12, 1)}))


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    print("== int8 vs bf16 conv stacks (sampler shapes) ==")
    for shape in [(240, 60, 60, 64, 64), (240, 60, 60, 128, 128), (240, 15, 15, 256, 256)]:
        probe(*shape)
    print("== int8 vs bf16 matmul 2048^3 ==")
    probe_matmul()
