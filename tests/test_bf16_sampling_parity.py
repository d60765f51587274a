"""bf16 sampling path: ensemble statistics must match f32 within tolerance.

The bench (bench.py) samples in bfloat16 for the 1.8x throughput win; this
test guards the CRPS-safety claim: for the same trained toy engine, ensemble
CRPS/MSE/SSR from bf16 sampling must agree with f32 within a few percent.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.diffusion import DyffusionConfig, DyffusionEngine
from dyffusion_tpu.utils.evaluation import evaluate_ensemble_prediction

B, H, W, C = 4, 8, 8, 2


def fc_apply(params, x, time, condition, rng):
    w = params
    t = time.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    cond = condition[..., :C] if condition is not None else 0.0
    return (w * x + 0.2 * cond + 0.01 * t).astype(x.dtype)


def ip_apply(params, x, time, condition, rng):
    # stochastic interpolator: linear blend + small dropout-like noise from rng
    h = params
    x0, xl = x[..., :C], x[..., C:]
    frac = (time / h).reshape((-1,) + (1,) * (x0.ndim - 1)).astype(x.dtype)
    out = (1 - frac) * x0 + frac * xl
    if rng is not None:
        out = out + (0.05 * jax.random.normal(rng, out.shape)).astype(x.dtype)
    return out


def test_bf16_sampling_statistics_match_f32():
    cfg = DyffusionConfig(timesteps=6, additional_interpolation_steps=2, num_input_channels=C)
    engine = DyffusionEngine(cfg, fc_apply, ip_apply, interpolator_horizon=6)
    cond32 = jax.random.normal(jax.random.key(0), (B, H, W, C))
    targets = jax.random.normal(jax.random.key(1), (B, 6, H, W, C))

    def run(dtype):
        fc = jnp.asarray(0.9, dtype)
        ip = jnp.asarray(6.0, dtype)
        cond = cond32.astype(dtype)
        preds = engine.sample_ensemble(
            fc, ip, jax.random.key(2), cond, num_predictions=16
        )  # (N, B, h, H, W, C)
        return np.asarray(preds, np.float32)

    p32 = run(jnp.float32)
    p16 = run(jnp.bfloat16)
    t = np.asarray(targets)
    m32 = evaluate_ensemble_prediction(p32.reshape(16, -1, H, W, C), t.reshape(-1, H, W, C))
    m16 = evaluate_ensemble_prediction(p16.reshape(16, -1, H, W, C), t.reshape(-1, H, W, C))
    for k in ("crps", "mse", "ssr"):
        rel = abs(float(m16[k]) - float(m32[k])) / max(abs(float(m32[k])), 1e-8)
        assert rel < 0.05, f"{k}: bf16={m16[k]} vs f32={m32[k]} (rel {rel:.3f})"
