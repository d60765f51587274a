"""MXU lane-fill ceiling probe at sampler shapes (VERDICT r2 next #2a).

PERF.md's post-pass roofline left the SST sampler at ~24% MFU with "conv
efficiency at C=64 (half-filled MXU lanes)" as a named-but-unmeasured lever.
This probe times jitted bf16 3x3 conv stacks at the sampler's actual shapes
(B=240 = the fused 2B interpolator batch, 60x60 grid) across channel widths,
reporting effective TFLOP/s and MFU per shape. Interpretation:

- ms(C=128) ~= ms(C=64)  -> C=64 half-fills the 128-wide output tile: the
  C=64 conv's MFU ceiling is ~50% of the C=128 conv's, and padding channels
  cannot speed the FIXED reference model (the hardware clocks the full tile
  either way) — a structural ceiling, not an unattacked lever.
- ms(C=128) ~= 2x ms(C=64) -> C=64 convs already pack efficiently and the
  lever never existed.

Also probes the deeper UNet levels (30x30 C=128, 15x15 C=256) and the
per-step serialization gap: one jitted forecaster+interpolator cold-step
chain vs the two calls timed separately.

Timing ends with a real device->host read (block_until_ready unreliable
here, PERF.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

V5E_PEAK_BF16 = 197e12


def time_fn(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


def conv_stack(n_layers=8):
    @jax.jit
    def run(x, w, w_back):
        # alternate forward/backward weights so Cin != Cout stacks type-check
        for i in range(n_layers):
            x = jax.lax.conv_general_dilated(
                x, w if i % 2 == 0 else w_back, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return x

    return run


def probe_convs():
    rows = []
    for B, H, W, Cin, Cout in [
        (240, 60, 60, 64, 64),    # sampler level-1 conv
        (240, 60, 60, 128, 128),  # lane-filling comparison
        (240, 60, 60, 64, 128),
        (240, 60, 60, 128, 64),
        (240, 30, 30, 128, 128),  # level 2
        (240, 15, 15, 256, 256),  # level 3
    ]:
        run = conv_stack()
        x = jnp.ones((B, H, W, Cin), jnp.bfloat16)
        w = jnp.ones((3, 3, Cin, Cout), jnp.bfloat16) * 0.01
        w_back = jnp.ones((3, 3, Cout, Cin), jnp.bfloat16) * 0.01
        dt = time_fn(run, x, w, w_back)
        flops = 8 * 2 * B * H * W * 3 * 3 * Cin * Cout  # 8 layers x 2 MACs
        row = {
            "shape": f"B{B} {H}x{W} {Cin}->{Cout}",
            "ms_per_8convs": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
            "mfu_pct": round(100 * flops / dt / V5E_PEAK_BF16, 1),
        }
        rows.append(row)
        print(json.dumps(row))
    return rows


def probe_step_serialization():
    """One fused cold step (F then 2B-batch I in one jit) vs the two calls
    jitted separately — the gap is inter-call dispatch/scheduling cost."""
    from dyffusion_tpu.models import BackboneSpec, Unet, init_backbone, make_apply_fn

    B, HW, C, dim = 120, 60, 1, 64
    spec_f = BackboneSpec(
        num_input_channels=C, num_output_channels=C,
        num_conditional_channels=C, spatial_shape=(HW, HW), with_time_emb=True,
    )
    spec_i = BackboneSpec(
        num_input_channels=2 * C, num_output_channels=C,
        num_conditional_channels=0, spatial_shape=(HW, HW), with_time_emb=True,
    )
    mk = lambda spec: Unet(
        dim=dim, num_input_channels=spec.num_input_channels,
        num_output_channels=spec.num_output_channels,
        num_conditional_channels=spec.num_conditional_channels,
        dim_mults=(1, 2, 4), with_time_emb=True,
        block_dropout=0.3, attn_dropout=0.1,
    )
    fc, ip = mk(spec_f), mk(spec_i)
    cast = lambda v: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), v)
    fcv = cast(init_backbone(fc, spec_f, jax.random.key(0)))
    ipv = cast(init_backbone(ip, spec_i, jax.random.key(1)))
    fca, ipa = make_apply_fn(fc), make_apply_fn(ip)

    x = jnp.ones((B, HW, HW, C), jnp.bfloat16)
    cond = jnp.ones((B, HW, HW, C), jnp.bfloat16)
    t = jnp.ones((B,), jnp.float32)
    t2 = jnp.ones((2 * B,), jnp.float32)
    key = jax.random.key(2)

    @jax.jit
    def fused(x, cond, t, t2, key):
        x0 = fca(fcv, x, t, cond, None)
        pair_in = jnp.concatenate(
            [jnp.concatenate([cond, x0], -1), jnp.concatenate([cond, x0], -1)], 0
        )
        pair = ipa(ipv, pair_in, t2, None, key)
        return x - pair[B:] + pair[:B]

    f_only = jax.jit(lambda x, t, cond: fca(fcv, x, t, cond, None))
    i_only = jax.jit(lambda pi, t2, key: ipa(ipv, pi, t2, None, key))

    dt_fused = time_fn(fused, x, cond, t, t2, key)
    dt_f = time_fn(f_only, x, t, cond)
    pair_in = jnp.concatenate([jnp.concatenate([cond, x], -1)] * 2, 0)
    dt_i = time_fn(i_only, pair_in, t2, key)
    print(json.dumps({
        "cold_step_fused_ms": round(dt_fused * 1e3, 2),
        "forecaster_ms": round(dt_f * 1e3, 2),
        "interpolator2B_ms": round(dt_i * 1e3, 2),
        "separate_sum_ms": round((dt_f + dt_i) * 1e3, 2),
        "gap_ms": round((dt_fused - dt_f - dt_i) * 1e3, 2),
    }))


if __name__ == "__main__":
    print("== conv channel-fill ceiling ==")
    probe_convs()
    print("== cold-step serialization ==")
    probe_step_serialization()
