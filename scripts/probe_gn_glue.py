"""GroupNorm+FiLM+SiLU glue cost at sampler shapes (round-3 perf probe).

PERF.md's post-pass roofline attributes the sampler's remaining non-conv time
to BW-bound glue (GroupNorm, FiLM, SiLU, attention glue). This probe measures
what a fused Pallas GroupNorm kernel could possibly win, by timing 8-layer
jitted bf16 stacks at the sampler's shapes:

- (a) conv only                          -> structural floor
- (b) conv -> FiLM -> SiLU               -> elementwise epilogue XLA fuses free
- (c) conv -> flax nn.GroupNorm -> FiLM -> SiLU   -> the PRODUCT glue
- (d) same but GroupNorm via channel-wise f32 moments (no 5-D activation
  reshape: per-channel E[x]/E[x^2] then a tiny (B,C)->(B,G) combine)
- (e) same but GroupNorm via the naive 5-D reshape reduce

and printing the analytic Pallas one-pass floor (1 read + 1 write of the
activation per layer at HBM ~819 GB/s — a standalone kernel cannot fuse into
XLA's conv, so it pays at least this).

MEASURED CONCLUSION (TPU v5e, 2026-08-17, see PERF.md "GroupNorm glue"):
flax nn.GroupNorm (c) is already within noise of the best formulation (d)
and sits ~0.10 ms/layer above conv-only at the dominant B240 60x60 C64 shape
— BELOW the 0.27 ms/layer Pallas floor. Only the naive reshape formulation
(e) is slow (up to 0.39 ms/layer at 30x30 C128); the product never used it.
The glue lever is dead: do not build a Pallas GroupNorm for these shapes.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

HBM_BW = 819e9  # v5e


def time_fn(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def gn_reshape(x, groups, eps=1e-5):
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, groups, C // groups)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 4), keepdims=True)
    return ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)


def gn_channelwise(x, groups, eps=1e-5):
    B, H, W, C = x.shape
    k = C // groups
    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=(1, 2))
    s2 = jnp.mean(xf * xf, axis=(1, 2))
    gm = jnp.mean(s1.reshape(B, groups, k), axis=2)
    g2 = jnp.mean(s2.reshape(B, groups, k), axis=2)
    inv = jax.lax.rsqrt(g2 - gm * gm + eps)
    mC = jnp.repeat(gm, k, axis=1)[:, None, None, :]
    iC = jnp.repeat(inv, k, axis=1)[:, None, None, :]
    return ((xf - mC) * iC).astype(x.dtype)


class FlaxGNStack(nn.Module):
    C: int
    n: int = 8

    @nn.compact
    def __call__(self, x, scale, shift):
        for i in range(self.n):
            x = nn.Conv(self.C, (3, 3), padding="SAME", use_bias=False, name=f"c{i}")(x)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name=f"g{i}")(x)
            x = x * (scale + 1.0) + shift
            x = jax.nn.silu(x)
        return x


def make_fn_stack(gn, n=8, groups=8):
    @jax.jit
    def run(x, w, scale, shift):
        for _ in range(n):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            if gn is not None:
                x = gn(x, groups).astype(x.dtype)
            x = x * (scale + 1.0) + shift
            x = jax.nn.silu(x)
        return x

    return run


def main():
    n = 8
    for B, H, W, C in [
        (240, 60, 60, 64), (240, 30, 30, 128), (240, 15, 15, 256),
        (120, 60, 60, 64), (120, 30, 30, 128), (120, 15, 15, 256),
    ]:
        x = jnp.ones((B, H, W, C), jnp.bfloat16)
        w = jnp.full((3, 3, C, C), 0.01, jnp.bfloat16)
        scale = jnp.full((B, 1, 1, C), 0.1, jnp.bfloat16)
        shift = jnp.full((B, 1, 1, C), 0.05, jnp.bfloat16)

        def conv_only(x, w, s, sh):
            return make_fn_stack(None, n)(x, w, s, sh)

        m = FlaxGNStack(C=C, n=n)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), m.init(jax.random.key(0), x, scale, shift)
        )
        flax_fn = jax.jit(lambda v, x, s, sh: m.apply(v, x, s, sh))

        ms = {
            "conv_only": time_fn(make_fn_stack(None, n), x, w, scale, shift) * 1e3,
            "flax_gn": time_fn(flax_fn, v, x, scale, shift) * 1e3,
            "chanwise_gn": time_fn(make_fn_stack(gn_channelwise, n), x, w, scale, shift) * 1e3,
            "reshape_gn": time_fn(make_fn_stack(gn_reshape, n), x, w, scale, shift) * 1e3,
        }
        bytes_rw = 2 * B * H * W * C * x.dtype.itemsize
        print(json.dumps({
            "shape": f"B{B} {H}x{W} C{C}",
            **{k: round(v_, 3) for k, v_ in ms.items()},
            "flax_gn_marginal_ms_per_layer": round((ms["flax_gn"] - ms["conv_only"]) / n, 4),
            "pallas_1r1w_floor_ms_per_layer": round(n * bytes_rw / HBM_BW / n * 1e3, 4),
        }))


if __name__ == "__main__":
    main()
