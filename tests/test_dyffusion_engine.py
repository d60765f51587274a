"""DYffusion engine tests: p_losses semantics and the scan-based cold sampler.

The sampler is validated against a literal Python-loop transcription of the
reference algorithm (``src/diffusion/dyffusion.py:335-426``) using the same
deterministic toy "networks", so the scan/masking/fused-batch machinery is
proven equivalent to the sequential algorithm.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyffusion_tpu.diffusion import DyffusionConfig, DyffusionEngine

B, H, W, C = 2, 4, 4, 3


def toy_forecaster(params, x, time, condition, rng):
    """Deterministic 'forecaster': blend of x, condition, and time."""
    w1, w2 = params
    t = time.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    cond = 0.0 if condition is None else condition[..., :C]
    return w1 * x + w2 * cond + 0.01 * t


def toy_interpolator(params, x, time, condition, rng):
    """Deterministic 'interpolator': linear blend of x0 (first C ch) and
    x_last (last C ch) by i/h — the exact behavior of a perfect interpolator
    of linear dynamics."""
    h = params
    x0, xl = x[..., :C], x[..., C:2 * C]
    frac = (time / h).reshape((-1,) + (1,) * (x0.ndim - 1)).astype(x.dtype)
    return (1 - frac) * x0 + frac * xl


def make_engine(horizon=5, J=0, **kw):
    cfg = DyffusionConfig(
        timesteps=horizon,
        additional_interpolation_steps=J,
        num_input_channels=C,
        **kw,
    )
    return DyffusionEngine(
        cfg,
        forecaster_apply=toy_forecaster,
        interpolator_apply=toy_interpolator,
        interpolator_horizon=horizon,
    )


def reference_sample_loop(engine, fc_params, ip_params, x_cond):
    """Literal sequential transcription of ref sample_loop :335-426 (cold,
    deterministic nets, no dropout) for cross-checking the scan."""
    mp = engine.mapping
    N = engine.num_timesteps
    sched = engine.sampling_schedule
    x_s = x_cond[..., -C:]
    intermediates = {}
    x0_hat = None
    dynamics_pred_step = 0
    last_plus_one = sched[-1] + 1
    for s, s_next in zip(sched, sched[1:] + [last_plus_one]):
        is_last = s == N - 1
        t_b = jnp.full((B,), float(s))
        x0_hat = engine.predict_x_last(fc_params, x_cond, x_s, t_b)
        time_i_n = mp.i_of(s_next) if not is_last else np.inf
        is_dyn = float(time_i_n).is_integer() or is_last
        if s_next <= N - 1:
            x_ip_next = engine.q_sample(ip_params, x0_hat, x_cond, jnp.full((B,), float(s_next)))
        else:
            x_ip_next = x0_hat
        if is_last and not engine.cfg.use_cold_sampling_for_last_step:
            x_s = x0_hat
        else:
            x_ip_cur = (
                engine.q_sample(ip_params, x0_hat, x_cond, jnp.full((B,), float(s))) if s > 0 else x_s
            )
            x_s = x_s - x_ip_cur + x_ip_next
        dynamics_pred_step = int(time_i_n) if s < N - 1 else dynamics_pred_step + 1
        if is_dyn:
            intermediates[dynamics_pred_step] = x_s
    if engine.cfg.refine_intermediate_predictions:
        for i_n in mp.dynamical_steps.values():
            if i_n < N and i_n < mp.horizon:
                refined = engine.interpolate(ip_params, x_cond, x0_hat, jnp.full((B,), float(i_n)))
                intermediates[int(i_n)] = refined
    return intermediates


FC_PARAMS = (jnp.float32(0.9), jnp.float32(0.1))
IP_PARAMS = jnp.float32(5.0)


@pytest.mark.parametrize("refine", [False, True])
@pytest.mark.parametrize("J", [0, 2])
def test_scan_sampler_matches_sequential_reference(J, refine):
    engine = make_engine(horizon=5, J=J, refine_intermediate_predictions=refine)
    rng = jax.random.key(0)
    x_cond = jax.random.normal(jax.random.key(1), (B, H, W, C))
    preds = engine.sample(FC_PARAMS, IP_PARAMS, rng, x_cond)  # (B, h, H, W, C)
    assert preds.shape == (B, 5, H, W, C)
    ref = reference_sample_loop(engine, FC_PARAMS, IP_PARAMS, x_cond)
    assert set(ref.keys()) == set(range(1, 6))
    for i in range(1, 6):
        np.testing.assert_allclose(preds[:, i - 1], ref[i], rtol=2e-5, atol=2e-5)


def test_sampler_naive_mode_and_cold_last_step():
    x_cond = jax.random.normal(jax.random.key(2), (B, H, W, C))
    for kw in [dict(sampling_type="naive"), dict(use_cold_sampling_for_last_step=True)]:
        engine = make_engine(horizon=4, **kw)
        preds = engine.sample(FC_PARAMS, IP_PARAMS, jax.random.key(0), x_cond)
        ref = reference_sample_loop(engine, FC_PARAMS, IP_PARAMS, x_cond)
        for i in ref:
            if kw.get("sampling_type") != "naive":
                np.testing.assert_allclose(preds[:, i - 1], ref[i], rtol=2e-5, atol=2e-5)
        assert jnp.all(jnp.isfinite(preds))


def test_sampler_with_dsl_schedule():
    engine = make_engine(horizon=5, J=3, sampling_schedule="only_dynamics")
    assert engine.sampling_schedule == [0, 4, 5, 6, 7]
    x_cond = jnp.ones((B, H, W, C))
    preds = engine.sample(FC_PARAMS, IP_PARAMS, jax.random.key(0), x_cond)
    assert preds.shape == (B, 5, H, W, C)
    ref = reference_sample_loop(engine, FC_PARAMS, IP_PARAMS, x_cond)
    for i in ref:
        np.testing.assert_allclose(preds[:, i - 1], ref[i], rtol=2e-5, atol=2e-5)


def test_p_losses_t0_rows_use_condition():
    """Rows with t=0 must feed the raw condition to the forecaster (ref :513-527)."""
    engine = make_engine(horizon=5)
    xt_last = jnp.ones((B, H, W, C)) * 3.0
    condition = jnp.ones((B, H, W, C))
    # t = [0, 3]: row 0 -> x_t = condition; row 1 -> interpolated
    t = jnp.array([0.0, 3.0])
    loss, aux = engine.p_losses(FC_PARAMS, IP_PARAMS, jax.random.key(0), xt_last, condition, t)
    # manual: row0 pred = w1*cond + w2*cond + 0; row1 x_t = (1-3/5)*cond + 3/5*xt_last
    x_t1 = 0.4 * condition[1] + 0.6 * xt_last[1]
    p0 = 0.9 * condition[0] + 0.1 * condition[0] + 0.01 * 0
    p1 = 0.9 * x_t1 + 0.1 * condition[1] + 0.01 * 3
    expected = 0.5 * (jnp.mean((p0 - 3.0) ** 2) + jnp.mean((p1 - 3.0) ** 2))
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)


def test_p_losses_lambda2_masks_last_timestep():
    engine = make_engine(horizon=3, lambda_reconstruction2=0.5)
    xt_last = jnp.ones((B, H, W, C)) * 2.0
    condition = jnp.zeros((B, H, W, C))
    # t = [N-1, 0]: row 0 must be excluded from the λ2 term
    t = jnp.array([2.0, 0.0])
    loss, aux = engine.p_losses(FC_PARAMS, IP_PARAMS, jax.random.key(0), xt_last, condition, t)
    assert jnp.isfinite(loss)
    assert float(aux["loss_forward2"]) >= 0.0
    # with all rows at t=N-1 the λ2 term must be exactly 0 contribution-free
    t_all_last = jnp.full((B,), 2.0)
    _, aux2 = engine.p_losses(FC_PARAMS, IP_PARAMS, jax.random.key(0), xt_last, condition, t_all_last)
    # masked mean over zero rows -> 0
    assert float(aux2["loss_forward2"]) == pytest.approx(0.0, abs=1e-7)


def test_loss_gradients_flow_to_forecaster_only():
    engine = make_engine(horizon=4, lambda_reconstruction2=0.3)
    xt_last = jax.random.normal(jax.random.key(3), (B, H, W, C))
    condition = jax.random.normal(jax.random.key(4), (B, H, W, C))

    def loss_fn(fc_params):
        loss, _ = engine.loss(fc_params, IP_PARAMS, jax.random.key(0), xt_last, condition)
        return loss

    g = jax.grad(loss_fn)(FC_PARAMS)
    assert all(jnp.isfinite(gi) and gi != 0 for gi in g)


def test_sample_ensemble_shape_and_member_diversity():
    engine = make_engine(horizon=4, forward_conditioning="data+noise")
    x_cond = jnp.ones((B, H, W, C))
    preds = engine.sample_ensemble(
        FC_PARAMS, IP_PARAMS, jax.random.key(0), x_cond, num_predictions=3, inputs_noise=0.1
    )
    assert preds.shape == (3, B, 4, H, W, C)
    # members differ (inputs noise + data+noise conditioning)
    assert not jnp.allclose(preds[0], preds[1])


def test_p_losses_rejects_window_stacked_condition():
    """window>1 DYffusion training is broken in the reference itself (ref
    dyffusion.py:513-527 assigns the C-channel interpolator output into the
    window*C condition clone); we fail loudly instead of silently
    broadcasting."""
    eng = make_engine(horizon=5)
    fc, ip = (jnp.float32(0.5), jnp.float32(0.1)), jnp.float32(5.0)
    xt_last = jnp.ones((B, H, W, C))
    stacked_cond = jnp.ones((B, H, W, 2 * C))  # window=2
    t = jnp.zeros((B,))
    with pytest.raises(ValueError, match="window"):
        eng.p_losses(fc, ip, jax.random.key(0), xt_last, stacked_cond, t)
