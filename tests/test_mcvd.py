"""MCVD stack tests: sigma schedules, NCSNpp forward, engine loss + samplers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyffusion_tpu.diffusion.mcvd import McvdConfig, McvdEngine, get_sigmas
from dyffusion_tpu.models.ncsnpp import NCSNpp


def test_get_sigmas_schedules():
    lin = get_sigmas("linear", 0.02, 0.0001, 10)
    assert lin[0] == pytest.approx(0.02) and lin[-1] == pytest.approx(0.0001)
    geo = get_sigmas("geometric", 1.0, 0.01, 5)
    np.testing.assert_allclose(geo[0], 1.0)
    np.testing.assert_allclose(geo[-1], 0.01)
    cos = get_sigmas("cosine", 0, 0, 8)
    # ascending alphas (big-noise first), bounded by 1
    assert len(cos) == 8 and np.all(np.diff(cos) > 0) and cos[-1] < 1.0
    # mcvd convention: alphas big-noise first => increasing towards 1
    cfg = McvdConfig(timesteps=10)
    eng = McvdEngine(cfg, lambda *a: None, (4, 4, 1))
    a = np.asarray(eng.alphas)
    assert np.all(np.diff(a) >= 0) and a[-1] == pytest.approx(1 - 0.0001, rel=1e-3)
    np.testing.assert_allclose(np.asarray(eng.alphas_prev)[:-1], a[1:])


@pytest.fixture(scope="module")
def ncsnpp_setup():
    model = NCSNpp(
        dim=16,
        num_input_channels=2,  # e.g. 2 stacked horizon frames x 1 channel
        num_output_channels=2,
        num_conditional_channels=1,
        dim_mults=(1, 2),
        num_res_blocks=1,
        attn_resolutions=(8,),
        n_head_channels=16,
        spatial_height=16,
    )
    x = jnp.ones((2, 16, 16, 2))
    cond = jnp.zeros((2, 16, 16, 1))
    t = jnp.array([3.0, 7.0])
    variables = jax.jit(
        lambda: model.init({"params": jax.random.key(0)}, x, time=t, condition=cond)
    )()
    return model, variables, x, cond, t


def test_ncsnpp_forward_shape_and_zero_init(ncsnpp_setup):
    model, variables, x, cond, t = ncsnpp_setup
    y = model.apply(variables, x, time=t, condition=cond)
    assert y.shape == (2, 16, 16, 2)
    # near-zero output conv at init (ref init_scale=0 -> default_init(1e-10),
    # layers.py:77-80 — variance 1e-10, not exact zeros)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-3)
    # AdaGN conditioning params exist in the BigGAN blocks (ref get_act_norm)
    assert "dense" in variables["params"]["mid_block1"]["actnorm0"]


def test_ncsnpp_ddpm_resblock_path_with_fused_resampling():
    """resblock_type='ddpm' routes resolution changes through the standalone
    FIR resamplers with FUSED conv kernels (ref layerspp.Upsample/Downsample
    with_conv=True -> up_or_down_sampling.Conv2d)."""
    model = NCSNpp(
        dim=16, num_input_channels=2, num_output_channels=2,
        num_conditional_channels=1, dim_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(8,), n_head_channels=16, spatial_height=16,
        resblock_type="ddpm",
    )
    x = jnp.ones((2, 16, 16, 2))
    cond = jnp.zeros((2, 16, 16, 1))
    t = jnp.array([3.0, 7.0])
    variables = jax.jit(
        lambda: model.init({"params": jax.random.key(0)}, x, time=t, condition=cond)
    )()
    # fused resampler conv kernels present
    assert variables["params"]["down0_downsample"]["kernel"].shape == (3, 3, 16, 16)
    assert variables["params"]["up0_upsample"]["kernel"].shape == (3, 3, 32, 32)
    y = model.apply(variables, x, time=t, condition=cond)
    assert y.shape == (2, 16, 16, 2)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_ncsnpp_time_sensitivity_after_perturbation(ncsnpp_setup):
    model, variables, x, cond, t = ncsnpp_setup
    # nudge the output conv away from zero so time dependence is observable
    params = jax.tree_util.tree_map(lambda p: p + 0.01, variables["params"])
    y1 = model.apply({"params": params}, x, time=jnp.array([0.0, 0.0]), condition=cond)
    y2 = model.apply({"params": params}, x, time=jnp.array([50.0, 50.0]), condition=cond)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def _toy_scorenet(variables, x, t, cond, rng):
    w = variables
    tb = t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    c = 0.0 if cond is None else 0.05 * cond[..., :1]
    return w * x * 0.1 + 0.001 * tb + c


@pytest.mark.parametrize("version", ["DDPM", "DDIM", "FPNDM"])
def test_mcvd_samplers_run_and_finite(version):
    cfg = McvdConfig(version=version, timesteps=20, sampling_timesteps=5)
    eng = McvdEngine(cfg, _toy_scorenet, (8, 8, 2))
    cond = jnp.ones((3, 8, 8, 2))
    out = jax.jit(lambda r, c: eng.sample(jnp.float32(1.0), r, c))(jax.random.key(0), cond)
    assert out.shape == (3, 8, 8, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_mcvd_loss_and_gamma_noise():
    for gamma in (False, True):
        cfg = McvdConfig(timesteps=12, gamma=gamma, noise_in_cond=True)
        eng = McvdEngine(cfg, _toy_scorenet, (8, 8, 2))
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, 2))
        cond = jnp.ones((4, 8, 8, 2))
        loss, aux = eng.loss(jnp.float32(1.0), jax.random.key(2), x, cond)
        assert np.isfinite(float(loss))
        # gamma noise should have ~zero mean after normalization
        if gamma:
            t = jnp.zeros((2048,), jnp.int32)
            z = eng._noise_like(jax.random.key(3), (2048, 1, 1, 1), t)
            assert abs(float(jnp.mean(z))) < 0.1


def test_ddpm_subsampling_matches_reference_coefficients():
    cfg = McvdConfig(timesteps=20, sampling_timesteps=5)
    eng = McvdEngine(cfg, _toy_scorenet, (4, 4, 1))
    steps, alphas, alphas_prev, betas = eng._subsampled_schedule()
    # reference: skip = T // sub; steps = range(0, T, skip); recompute
    assert list(steps) == [0, 4, 8, 12, 16]
    full = np.asarray(eng.alphas)
    np.testing.assert_allclose(alphas, full[steps])
    np.testing.assert_allclose(alphas_prev, np.concatenate([full[steps][1:], [1.0]]))
    np.testing.assert_allclose(betas, 1 - alphas / alphas_prev, rtol=1e-6)


def test_langevin_sampler_family_runs_and_finite():
    """The full SMLD sampler zoo (ref src/models/mcvd/__init__.py:419-976):
    plain / sparse / consistent / sparse-consistent / inpainting /
    interpolation annealed Langevin, all as scans."""
    from dyffusion_tpu.diffusion.mcvd import (
        anneal_langevin_dynamics,
        anneal_langevin_dynamics_consistent,
        anneal_langevin_dynamics_inpainting,
        anneal_langevin_dynamics_interpolation,
        get_sigmas,
        sparse_anneal_langevin_dynamics,
        sparse_anneal_langevin_dynamics_consistent,
    )

    sigmas = get_sigmas("geometric", 1.0, 0.01, 6)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 2))
    cond = jnp.ones((2, 8, 8, 2))
    w = jnp.float32(1.0)

    out = jax.jit(
        lambda r: anneal_langevin_dynamics(_toy_scorenet, w, r, x, cond, sigmas, n_steps_each=2, step_lr=1e-4)
    )(jax.random.key(1))
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))

    sparsity = jnp.full((1, 8, 8, 1), 0.5)
    out = jax.jit(
        lambda r: sparse_anneal_langevin_dynamics(
            _toy_scorenet, w, r, x, sparsity, cond, sigmas, n_steps_each=2, step_lr=1e-4
        )
    )(jax.random.key(2))
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))

    # CAS needs step_lr inside the (sigma_L^2-derived) stability window
    step_lr = float(0.01**2)
    out = jax.jit(
        lambda r: anneal_langevin_dynamics_consistent(
            _toy_scorenet, w, r, x, cond, sigmas, n_steps_each=2, step_lr=step_lr
        )
    )(jax.random.key(3))
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))

    out = jax.jit(
        lambda r: sparse_anneal_langevin_dynamics_consistent(
            _toy_scorenet, w, r, x, sparsity, cond, sigmas, n_steps_each=2, step_lr=step_lr
        )
    )(jax.random.key(4))
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))

    # inpainting: left half known
    known = np.zeros((1, 8, 8, 1), np.float32)
    known[:, :, :4] = 1.0
    refer = jnp.zeros_like(x)
    out = jax.jit(
        lambda r: anneal_langevin_dynamics_inpainting(
            _toy_scorenet, w, r, x, refer, jnp.asarray(known), cond, sigmas, n_steps_each=2, step_lr=1e-4
        )
    )(jax.random.key(5))
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))

    # interpolation: B rows x n_interpolations chains
    cond3 = jnp.ones((2 * 3, 8, 8, 2))
    out = jax.jit(
        lambda r: anneal_langevin_dynamics_interpolation(
            _toy_scorenet, w, r, x, 3, cond3, sigmas, n_steps_each=2, step_lr=1e-4
        )
    )(jax.random.key(6))
    assert out.shape == (6, 8, 8, 2) and bool(jnp.all(jnp.isfinite(out)))


def test_consistent_langevin_ladder_and_bounds():
    """CAS geometric ladder has (L-1)*n_steps+1 levels and enforces the
    step_lr stability window (ref :640-651)."""
    from dyffusion_tpu.diffusion.mcvd import anneal_langevin_dynamics_consistent, get_sigmas

    sigmas = get_sigmas("geometric", 1.0, 0.01, 6)
    x = jnp.zeros((1, 4, 4, 1))
    with pytest.raises(AssertionError, match="step_lr"):
        anneal_langevin_dynamics_consistent(
            _toy_scorenet, jnp.float32(1.0), jax.random.key(0), x, None, sigmas, step_lr=1.0
        )
