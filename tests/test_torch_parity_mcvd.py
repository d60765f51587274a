"""MCVD ENGINE golden parity vs the literal torch reference.

``UNetMore_DDPM.p_losses`` (incl. Gamma noise + noise-in-cond) and the full
sampler library — ``ddpm_sampler`` (subsampled + final denoise),
``ddim_sampler``, ``FPNDM_sampler`` (RK warmup + Adams-Bashforth) — compared
END-TO-END against the reference (ref ``src/diffusion/mcvd.py:17-177``,
``src/models/mcvd/__init__.py:37-417``, ``pndm.py:4-58``). Both sides use a
duck-typed CLOSED-FORM scorenet implementing identical math (backbone parity
is covered separately by tests/test_torch_parity*.py), and the reference
replays the exact noise arrays our scan-based samplers draw, so every
trajectory is deterministic.

Note: the reference's ``UNetMore_DDPM.sample`` with version=DDIM/FPNDM is
latently broken (samplers call ``scorenet(x, labels)`` with a ``cond=``
partial, which routes to ``BaseDiffusion.forward`` and crashes on the
unexpected kwarg) — those samplers are therefore driven directly here, as
the stand-alone library functions they are.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("scipy")

import jax
import jax.numpy as jnp

from tests._reference_import import import_reference

B, C, SC, HGT, WID = 2, 3, 2, 6, 6
T = 8


# --------------------------------------------------------------------------
# duck scorenet: identical closed-form math in torch (NCHW) and jax (NCHW)
# --------------------------------------------------------------------------
class _DuckScorenetTorch(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.hparams = {}

    def forward(self, x, time=None, condition=None, cond_mask=None, cond=None):
        condition = condition if condition is not None else cond
        temb = torch.sin(0.1 * time.float()).reshape(-1, 1, 1, 1)
        c = condition.mean(dim=1, keepdim=True) if condition is not None else 0.0
        u = 0.7 * x + 0.3 * c + temb
        # rational bounded nonlinearity: pure mul/add/div round identically
        # in torch and XLA (tanh's libm-vs-XLA approximations differ ~3e-5,
        # which DDPM's 1/(1-alpha) coefficients amplify across steps)
        return u / (1.0 + 0.25 * u * u) + 0.05 * x


def _duck_scorenet_apply(variables, x, time, condition, rng):
    temb = jnp.sin(0.1 * time.astype(jnp.float32)).reshape(-1, 1, 1, 1)
    c = jnp.mean(condition, axis=1, keepdims=True) if condition is not None else 0.0
    u = 0.7 * x + 0.3 * c + temb
    return u / (1.0 + 0.25 * u * u) + 0.05 * x


class _NoiseQueue:
    def __init__(self, arrays):
        self.q = [torch.from_numpy(np.ascontiguousarray(np.asarray(a))) for a in arrays]

    def randn(self, *shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
            shape = tuple(shape[0])
        a = self.q.pop(0)
        assert tuple(a.shape) == tuple(shape), (a.shape, shape)
        return a

    def randn_like(self, x):
        a = self.q.pop(0)
        assert a.shape == x.shape, (a.shape, x.shape)
        return a


class _GammaQueue:
    """Replays raw Gamma draws through the ref's ``Gamma(k, 1/theta).sample()``."""

    def __init__(self, arrays):
        self.q = [torch.from_numpy(np.ascontiguousarray(np.asarray(a))) for a in arrays]

    def __call__(self, conc, rate):
        outer = self

        class _D:
            def sample(self, sample_shape=()):
                a = outer.q.pop(0)
                return a

        return _D()


def _build_ref_engine(**kw):
    ref_mod = import_reference("src.diffusion.mcvd")
    net = _DuckScorenetTorch()
    # BaseDiffusion copies channel/spatial metadata from the model
    net.spatial_shape = (HGT, WID)
    net.num_input_channels = C
    net.num_output_channels = C
    net.num_conditional_channels = SC
    eng = ref_mod.UNetMore_DDPM(
        model=net, timesteps=T, loss_function="mean_squared_error", **kw)
    eng.eval()
    return ref_mod, eng


def _build_our_engine(**kw):
    from dyffusion_tpu.diffusion.mcvd import McvdConfig, McvdEngine

    return McvdEngine(
        McvdConfig(timesteps=T, **kw),
        scorenet_apply=_duck_scorenet_apply, sample_shape=(C, HGT, WID),
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(21)
    x = rng.normal(size=(B, C, HGT, WID)).astype(np.float32)
    cond = rng.normal(size=(B, SC, HGT, WID)).astype(np.float32)
    return x, cond


@pytest.mark.parametrize("beta_schedule", ["linear", "cosine"])
def test_buffers_match_reference(beta_schedule):
    _, ref = _build_ref_engine(beta_schedule=beta_schedule)
    ours = _build_our_engine(beta_schedule=beta_schedule)
    for name in ("betas", "alphas", "alphas_prev"):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)), getattr(ref, name).numpy(),
            rtol=1e-6, atol=1e-7, err_msg=name)


def test_gamma_buffers_match_reference():
    _, ref = _build_ref_engine(gamma=True)
    ours = _build_our_engine(gamma=True)
    np.testing.assert_allclose(np.asarray(ours.k_cum), ref.k_cum.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.theta_t), ref.theta_t.numpy(), rtol=1e-6)


def test_p_losses_parity(data):
    """Noise-prediction loss with matched z (ref mcvd.py:66-116)."""
    x, cond = data
    _, ref = _build_ref_engine()
    ours = _build_our_engine()

    key = jax.random.key(3)
    k_z, _, _ = jax.random.split(key, 3)
    z = jax.random.normal(k_z, x.shape)
    t = np.array([0, T - 1], np.int64)

    queue = _NoiseQueue([z])
    orig = torch.randn_like
    torch.randn_like = queue.randn_like
    try:
        with torch.no_grad():
            ref_loss = ref.p_losses(
                torch.from_numpy(x), t=torch.from_numpy(t), condition=torch.from_numpy(cond))
    finally:
        torch.randn_like = orig
    assert not queue.q

    loss, _ = ours.p_losses(None, key, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)


def test_p_losses_noise_in_cond_intended_semantics(data):
    """noise_in_cond loss vs a corrected literal transcription.

    The reference has a genuine bug here: the ``if self.noise_in_cond`` block
    REUSES the variable ``z`` for the condition noise (ref mcvd.py:109), so
    ``loss = criterion(z_pred, z)`` at :113 targets the CONDITION's noise —
    crashing (or silently broadcasting) whenever cond channels != x channels.
    Our engine keeps the x-noise target (the intended semantics); this test
    pins the corrected transcription: perturb x with z, perturb cond with zc,
    predict from the noised pair, loss against z."""
    x, cond = data
    ours = _build_our_engine(noise_in_cond=True)

    key = jax.random.key(3)
    k_z, k_cond, _ = jax.random.split(key, 3)
    z = jax.random.normal(k_z, x.shape)
    zc = jax.random.normal(k_cond, cond.shape)
    t = np.array([1, T - 2], np.int64)

    a = np.asarray(ours.alphas)[t].reshape(-1, 1, 1, 1)
    perturbed = np.sqrt(a) * x + np.sqrt(1 - a) * np.asarray(z)
    cond_noised = np.sqrt(a) * cond + np.sqrt(1 - a) * np.asarray(zc)
    z_pred = _duck_scorenet_apply(
        None, jnp.asarray(perturbed), jnp.asarray(t, jnp.float32), jnp.asarray(cond_noised), None)
    expected = float(jnp.mean((z_pred - z) ** 2))

    loss, _ = ours.p_losses(None, key, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    np.testing.assert_allclose(float(loss), expected, rtol=2e-5)


def test_p_losses_gamma_parity(data):
    """Gamma-noise diffusion loss with the ref replaying OUR raw Gamma draws
    (standardization (z - k*theta)/sqrt(1-a) happens identically both sides,
    ref mcvd.py:78-85)."""
    x, cond = data
    ref_mod, ref = _build_ref_engine(gamma=True)
    ours = _build_our_engine(gamma=True)

    key = jax.random.key(5)
    k_z, _, _ = jax.random.split(key, 3)
    t = np.array([1, T - 2], np.int64)
    bshape = (-1,) + (1,) * (x.ndim - 1)
    k_buf = np.asarray(ours.k_cum)[t].reshape(bshape)
    th_buf = np.asarray(ours.theta_t)[t].reshape(bshape)
    z_raw = jax.random.gamma(k_z, jnp.broadcast_to(jnp.asarray(k_buf), x.shape)) * th_buf

    orig = ref_mod.Gamma
    ref_mod.Gamma = _GammaQueue([z_raw])
    try:
        with torch.no_grad():
            ref_loss = ref.p_losses(
                torch.from_numpy(x), t=torch.from_numpy(t), condition=torch.from_numpy(cond))
    finally:
        ref_mod.Gamma = orig

    loss, _ = ours.p_losses(None, key, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)


@pytest.mark.parametrize("subsample,denoise,just_beta", [
    (None, True, False), (4, True, False), (4, False, True),
])
def test_ddpm_sampler_parity(subsample, denoise, just_beta, data):
    """Full ancestral MCVD sampler via the reference's OWN
    ``UNetMore_DDPM.sample`` driver (ref mcvd.py:118-177 + ddpm_sampler
    :245-417), replaying our scan's init + per-step noise."""
    _, cond = data
    _, ref = _build_ref_engine(sampling_timesteps=subsample, sampling_denoise=denoise)
    ours = _build_our_engine(
        sampling_timesteps=subsample, sampling_denoise=denoise, just_beta=just_beta)

    key = jax.random.key(7)
    shape = (B, C, HGT, WID)
    k_init, k_loop, _ = jax.random.split(key, 3)
    img0 = jax.random.normal(k_init, shape)
    n = len(ours._subsampled_schedule()[0])
    noises = [jax.random.normal(jax.random.fold_in(k_loop, i), shape) for i in range(n - 1)]

    orig_randn, orig_like = torch.randn, torch.randn_like
    try:
        with torch.no_grad():
            if just_beta:
                # The ref DRIVER hardcodes just_beta=False (mcvd.py:168); the
                # just_beta branch is only reachable via the stand-alone
                # library sampler, so drive that directly.
                queue = _NoiseQueue(noises)
                torch.randn, torch.randn_like = queue.randn, queue.randn_like
                lib = import_reference("src.models.mcvd")
                ref_out = lib.ddpm_sampler(
                    torch.from_numpy(np.asarray(img0)), _DuckLibScorenet(ref),
                    cond=torch.from_numpy(cond), subsample_steps=subsample,
                    just_beta=True, denoise=denoise, final_only=True, log=False,
                ).numpy()[0]
            else:
                queue = _NoiseQueue([img0] + noises)
                torch.randn, torch.randn_like = queue.randn, queue.randn_like
                ref_out = ref.sample(torch.from_numpy(cond))["preds"].numpy()
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like
    assert not queue.q

    ref_out = ref_out[0] if ref_out.ndim == 5 else ref_out  # final_only unsqueeze
    out = np.asarray(ours.ddpm_sample(None, key, jnp.asarray(cond)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-5)


class _DuckLibScorenet(torch.nn.Module):
    """Callable scorenet for the stand-alone ddim/FPNDM samplers, carrying
    the schedule buffers they read off ``net.*``."""

    def __init__(self, ref_engine):
        super().__init__()
        self.net = _DuckScorenetTorch()
        self.alphas = ref_engine.alphas
        self.alphas_prev = ref_engine.alphas_prev
        self.betas = ref_engine.betas
        self.model = self.net  # ddpm_sampler-style access

    def forward(self, x, time=None, cond=None, condition=None):
        return self.net(x, time=time, condition=condition if condition is not None else cond)


@pytest.mark.parametrize("subsample,denoise", [(None, True), (4, False)])
def test_ddim_sampler_parity(subsample, denoise, data):
    """Stand-alone ddim_sampler (ref __init__.py:113-242) vs our scan."""
    _, cond = data
    ref_mod, ref = _build_ref_engine(sampling_timesteps=subsample)
    lib = import_reference("src.models.mcvd")
    ours = _build_our_engine(sampling_timesteps=subsample, sampling_denoise=denoise)

    key = jax.random.key(9)
    k_init, _ = jax.random.split(key)
    img0 = jax.random.normal(k_init, (B, C, HGT, WID))

    with torch.no_grad():
        ref_out = lib.ddim_sampler(
            torch.from_numpy(np.asarray(img0)), _DuckLibScorenet(ref),
            cond=torch.from_numpy(cond), subsample_steps=subsample,
            denoise=denoise, final_only=True, log=False,
        ).numpy()[0]
    out = np.asarray(ours.ddim_sample(None, key, jnp.asarray(cond)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-5)


def test_fpndm_sampler_parity(data):
    """Stand-alone FPNDM_sampler: 3 Runge-Kutta warmup steps + 1
    Adams-Bashforth step (ref __init__.py:37-110 + pndm.py:4-58) vs our
    single-scan formulation with the noise history in the carry."""
    _, cond = data
    _, ref = _build_ref_engine(sampling_timesteps=4)
    lib = import_reference("src.models.mcvd")
    ours = _build_our_engine(sampling_timesteps=4)

    key = jax.random.key(11)
    k_init, _ = jax.random.split(key)
    img0 = jax.random.normal(k_init, (B, C, HGT, WID))

    with torch.no_grad():
        ref_out = lib.FPNDM_sampler(
            torch.from_numpy(np.asarray(img0)), _DuckLibScorenet(ref),
            cond=torch.from_numpy(cond), subsample_steps=4,
            final_only=True, log=False,
        ).numpy()[0]
    out = np.asarray(ours.fpndm_sample(None, key, jnp.asarray(cond)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-5)
