"""Training-path conv ceiling probe (the backward-pass sibling of
``probe_conv_ceiling.py``).

PERF.md's round-3 train bench measured the product train step at 23-24% MFU
(f32) on both stages and attributed it to "the same conv-at-C<=128/60x60
shape efficiency" as the sampler — but that claim was inferred, not measured:
the sampler ceiling probe only timed FORWARD convs. A train step's FLOPs are
~3x conv passes (forward + input-grad conv + weight-grad conv), and the two
backward convs have different geometry:

- input-grad: conv with spatially-flipped kernels, Cout->Cin — same MXU
  shape class as the forward (lane fill set by Cin).
- weight-grad: a contraction over B*H*W producing (3,3,Cin,Cout) — a tall
  skinny matmul whose M dimension is the 3x3 patch grid; packs differently.

This probe times jitted value_and_grad over conv stacks at the TRAIN shapes
(batch 64 per ``oisst_pacific.yaml``, 60x60) in f32 (the parity-default
train dtype) and bf16 (the opt-in mixed-precision path), reporting combined
fwd+bwd MFU per shape. If the C=64 train-conv MFU lands near the sampler's
46.8% structural ceiling, the 23-24% whole-step MFU is ~half glue —
the same decomposition as the sampler — and "optimize the train step" has
the same answer: the ceiling is the reference model's fixed dim=64, not an
unattacked software lever.

Reference hot loop this bounds: ``src/diffusion/dyffusion.py:496-567``.
Timing ends with a real device->host read (block_until_ready unreliable on
this host, PERF.md "measurement pitfalls").
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

V5E_PEAK = {"bfloat16": 197e12, "float32": 98.3e12}
N_LAYERS = 8


def time_fn(fn, *args, iters=30):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    return (time.perf_counter() - t0) / iters


def make_train_stack(dtype):
    """value_and_grad over an N-layer 3x3 conv stack; grads wrt the weights
    (what optax consumes) force BOTH backward conv kinds per layer."""

    def loss(ws, x):
        for i in range(N_LAYERS):
            x = jax.lax.conv_general_dilated(
                x, ws[i], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return jnp.sum(x.astype(jnp.float32) ** 2)

    return jax.jit(jax.value_and_grad(loss))


def probe(dtype_name):
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    peak = V5E_PEAK[dtype_name]
    rows = []
    for B, H, W, Cin, Cout in [
        (64, 60, 60, 64, 64),     # SST train level-1 conv (batch 64)
        (64, 60, 60, 128, 128),   # lane-filling comparison
        (64, 30, 30, 128, 128),   # level 2
        (64, 15, 15, 256, 256),   # level 3
        (128, 60, 60, 64, 64),    # stage-2 2B interpolator batch
    ]:
        if Cin != Cout:
            raise ValueError("stack requires Cin == Cout")
        run = make_train_stack(dtype)
        ws = [jnp.full((3, 3, Cin, Cout), 0.01, dtype) for _ in range(N_LAYERS)]
        x = jnp.ones((B, H, W, Cin), dtype)
        dt = time_fn(run, ws, x)
        # fwd + input-grad + weight-grad = 3 conv passes per layer (the last
        # layer's input-grad is still computed to chain to earlier layers;
        # layer 0's is dead but XLA keeps the chain — count 3x uniformly,
        # consistent with how bench_train counts the product step).
        flops = 3 * N_LAYERS * 2 * B * H * W * 3 * 3 * Cin * Cout
        row = {
            "dtype": dtype_name,
            "shape": f"B{B} {H}x{W} {Cin}->{Cout}",
            "ms_per_step": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
            "mfu_pct": round(100 * flops / dt / peak, 1),
        }
        rows.append(row)
        print(json.dumps(row))
    return rows


if __name__ == "__main__":
    print("== train (fwd+bwd) conv ceiling, f32 (parity-default train dtype) ==")
    probe("float32")
    print("== train (fwd+bwd) conv ceiling, bf16 (mixed-precision path) ==")
    probe("bfloat16")
