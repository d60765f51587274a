"""LR schedules vs the reference formulas, DSL extras, fractional sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyffusion_tpu.training.optim import (
    build_optimizer,
    linear_schedule,
    warmup_cosine_schedule,
    warmup_cosine_schedule2,
)


def ref_warmup_cosine(n, warm, lr_min, lr_max, lr_start, max_decay):
    """Literal reference formula (lr_scheduler.py:23-35)."""
    if n < warm:
        return (lr_max - lr_start) / warm * n + lr_start
    t = min((n - warm) / (max_decay - warm), 1.0)
    return lr_min + 0.5 * (lr_max - lr_min) * (1 + np.cos(t * np.pi))


def test_warmup_cosine_matches_reference_formula():
    sched = warmup_cosine_schedule(100, 0.1, 1.0, 0.01, 1000)
    for n in [0, 50, 99, 100, 101, 500, 999, 1000, 5000]:
        want = ref_warmup_cosine(n, 100, 0.1, 1.0, 0.01, 1000)
        assert float(sched(n)) == pytest.approx(want, rel=1e-5), n


def test_multi_cycle_schedules():
    kw = dict(
        warm_up_steps=[10, 5], f_min=[0.1, 0.0], f_max=[1.0, 0.5],
        f_start=[0.0, 0.0], cycle_lengths=[100, 200],
    )
    cos = warmup_cosine_schedule2(**kw)
    lin = linear_schedule(**kw)
    # warmup within cycle 0
    assert float(cos(5)) == pytest.approx(0.5, rel=1e-5)
    # second cycle restarts warmup at n=100.. (find_in_interval: n<=100 -> cycle 0)
    assert float(cos(102)) == pytest.approx((0.5 - 0.0) / 5 * 2, rel=1e-4)
    # linear decay end of cycle 0: f_min + (f_max-f_min)*(100-n)/100
    assert float(lin(60)) == pytest.approx(0.1 + 0.9 * 40 / 100, rel=1e-5)


def test_build_optimizer_with_scheduler_runs():
    import optax

    tx = build_optimizer(
        name="adamw", lr=1e-3,
        scheduler=dict(name="warmup_cosine", warm_up_steps=5, lr_min=0.1, lr_max=1.0, lr_start=0.0, max_decay_steps=50),
    )
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    updates, state = tx.update(g, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_first_float_schedule_dsl():
    from dyffusion_tpu.diffusion import StepMapping, parse_sampling_schedule

    mp = StepMapping.create(horizon=5, schedule="before_t1_only",
                            additional_interpolation_steps=4, interpolate_before_t1=True)
    # N=9, artificial steps d=1..4
    sched = parse_sampling_schedule("first0.5", mp)
    # ceil(0.5*4)=2 artificial steps + dynamical
    assert sched == [0, 1, 2, 5, 6, 7, 8]


def test_sample_at_times_fractional():
    from dyffusion_tpu.diffusion import DyffusionConfig, DyffusionEngine

    C = 2

    def fc(params, x, t, cond, rng):
        return 0.9 * x

    def ip(params, x, t, cond, rng):
        x0, xl = x[..., :C], x[..., C:]
        frac = (t / 4.0).reshape((-1, 1, 1, 1))
        return (1 - frac) * x0 + frac * xl

    eng = DyffusionEngine(DyffusionConfig(timesteps=4, num_input_channels=C), fc, ip, 4)
    cond = jnp.ones((2, 4, 4, C))
    dyn, frac = eng.sample_at_times(None, None, jax.random.key(0), cond, times=[0.5, 1.5, 2.0])
    assert dyn.shape == (2, 4, 4, 4, C)
    assert frac.shape == (2, 3, 4, 4, C)
    # t=2.0 fractional output must equal a fresh interpolation at i=2 of the
    # final x_last
    x_last = dyn[:, -1]
    want = 0.5 * cond + 0.5 * x_last
    np.testing.assert_allclose(np.asarray(frac[:, 2]), np.asarray(want), rtol=1e-5)


def test_varying_member_sweep():
    from dyffusion_tpu.utils.evaluation import evaluate_ensemble_prediction_for_varying_members

    rng = np.random.default_rng(0)
    preds = rng.normal(size=(6, 10, 4)).astype(np.float32)
    targets = rng.normal(size=(10, 4)).astype(np.float32)
    sweep = evaluate_ensemble_prediction_for_varying_members(preds, targets)
    assert sweep["crps"].shape == (6,)
    # CRPS should generally improve (decrease) with more members for iid noise
    assert sweep["crps"][-1] <= sweep["crps"][0]


def test_lr_schedules_match_literal_reference():
    """All three LDM-style schedules vs the LITERAL reference module
    (``src/utilities/lr_scheduler.py``, standalone numpy) over a step sweep
    spanning warmup, decay, cycle boundaries, and past-the-end clamping."""
    from tests._reference_import import load_standalone
    from dyffusion_tpu.training.optim import (
        linear_schedule,
        warmup_cosine_schedule,
        warmup_cosine_schedule2,
    )

    ref = load_standalone("ref_lr_scheduler", "/root/reference/src/utilities/lr_scheduler.py")

    r1 = ref.LambdaWarmUpCosineScheduler(
        warm_up_steps=10, lr_min=0.01, lr_max=1.0, lr_start=0.001, max_decay_steps=100)
    s1 = warmup_cosine_schedule(
        warm_up_steps=10, lr_min=0.01, lr_max=1.0, lr_start=0.001, max_decay_steps=100)
    for n in [0, 1, 5, 9, 10, 11, 50, 99, 100, 150]:
        np.testing.assert_allclose(float(s1(n)), r1(n), rtol=1e-6, err_msg=f"cosine n={n}")

    kw = dict(warm_up_steps=[5, 3], f_min=[0.1, 0.05], f_max=[1.0, 0.5],
              f_start=[0.0, 0.01], cycle_lengths=[20, 30])
    r2 = ref.LambdaWarmUpCosineScheduler2(**kw)
    s2 = warmup_cosine_schedule2(**kw)
    r3 = ref.LambdaLinearScheduler(**kw)
    s3 = linear_schedule(**kw)
    for n in [0, 2, 4, 5, 6, 15, 19, 20, 21, 24, 25, 40, 49]:
        np.testing.assert_allclose(float(s2(n)), r2(n), rtol=1e-6, err_msg=f"cosine2 n={n}")
        np.testing.assert_allclose(float(s3(n)), r3(n), rtol=1e-6, err_msg=f"linear n={n}")
