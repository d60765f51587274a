"""Annealed-Langevin (SMLD) sampler library golden parity vs the literal
torch reference.

The full zoo — plain / sparse / consistent (CAS) / sparse-consistent /
inpainting / interpolation annealed Langevin (ref
``src/models/mcvd/__init__.py:419-976``) — compared END-TO-END against the
reference library functions, with a duck-typed closed-form scorenet
(identical math both sides) and the reference replaying the exact noise
arrays our scan-based implementations draw.

Notable literal-reference semantics these tests pin down:
- dense CAS conditions the loop on the CONTINUOUS sigma but the final
  denoise on the INTEGER label ``len(sigmas)-1`` (ref :694-697);
- sparse CAS updates the dense chain with ``+eta*sigma^2*grad``, gives the
  sparse chain ONLY the scaled noise during the loop, and denoises with two
  scorenet calls (the second on the already-denoised dense chain, ref
  :805-830);
- inpainting re-corrupts the known region each step and treats the scorenet
  output as a score (``+ step*grad``, ref :884-894).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests._reference_import import import_reference

B, C, SC, HGT, WID = 2, 3, 2, 6, 6
L = 4           # sigma levels
NSTEPS = 2      # n_steps_each


class _DuckScorenetTorch(torch.nn.Module):
    def __init__(self, sigmas):
        super().__init__()
        self.register_buffer("sigmas", torch.as_tensor(np.asarray(sigmas), dtype=torch.float32))

    def forward(self, x, time=None, condition=None, cond_mask=None, cond=None,
                y_is_label=True):
        condition = condition if condition is not None else cond
        t = time.float().reshape(-1)
        temb = torch.sin(0.1 * t).reshape(-1, 1, 1, 1)
        c = condition.mean(dim=1, keepdim=True) if condition is not None else 0.0
        u = 0.7 * x + 0.3 * c + temb
        # rational bounded nonlinearity (rounds identically torch vs XLA)
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


@pytest.fixture(scope="module")
def setup():
    lib = import_reference("src.models.mcvd")
    sigmas = np.geomspace(1.0, 0.01, L).astype(np.float32)
    rng = np.random.default_rng(41)
    x = rng.normal(size=(B, C, HGT, WID)).astype(np.float32)
    cond = rng.normal(size=(B, SC, HGT, WID)).astype(np.float32)
    net = _DuckScorenetTorch(sigmas)
    net.eval()
    return lib, sigmas, x, cond, net


def _level_step_noises(key, n_levels, n_steps, shape, per_step=1):
    """Replicate our samplers' internal draw structure:
    split(rng, L) -> per level split(key, n_steps) -> per step draw(s)."""
    out = []
    for lk in jax.random.split(key, n_levels):
        for sk in jax.random.split(lk, n_steps):
            if per_step == 1:
                out.append(jax.random.normal(sk, shape))
            else:
                subkeys = jax.random.split(sk, per_step)
                out.extend(jax.random.normal(k, shape) for k in subkeys)
    return out


def _run_ref(fn, queue, **kw):
    orig_randn, orig_like = torch.randn, torch.randn_like
    torch.randn, torch.randn_like = queue.randn, queue.randn_like
    try:
        with torch.no_grad():
            out = fn(**kw)
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like
    assert not queue.q, f"{len(queue.q)} unconsumed noise draws"
    return out.numpy()[0]  # final_only -> unsqueeze(0)


def test_anneal_langevin_parity(setup):
    lib, sigmas, x, cond, net = setup
    from dyffusion_tpu.diffusion.mcvd import anneal_langevin_dynamics

    key = jax.random.key(1)
    noises = _level_step_noises(key, L, NSTEPS, x.shape)
    ref = _run_ref(
        lib.anneal_Langevin_dynamics, _NoiseQueue(noises),
        x_mod=torch.from_numpy(x.copy()), scorenet=net,
        cond=torch.from_numpy(cond), n_steps_each=NSTEPS, step_lr=1e-4,
        final_only=True, denoise=True, log=False, verbose=False,
    )
    ours = np.asarray(anneal_langevin_dynamics(
        _duck_scorenet_apply, None, key, jnp.asarray(x), jnp.asarray(cond),
        sigmas, n_steps_each=NSTEPS, step_lr=1e-4, denoise=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_sparse_anneal_langevin_parity(setup):
    lib, sigmas, x, cond, net = setup
    from dyffusion_tpu.diffusion.mcvd import sparse_anneal_langevin_dynamics

    sparsity = np.full((1, 1, 1, 1), 0.5, np.float32)
    key = jax.random.key(2)
    noises = _level_step_noises(key, L, NSTEPS, x.shape)
    ref = _run_ref(
        lib.sparse_anneal_Langevin_dynamics, _NoiseQueue(noises),
        x_mod_sparse=torch.from_numpy(x.copy()), sparsity=torch.from_numpy(sparsity),
        scorenet=net, cond=torch.from_numpy(cond), n_steps_each=NSTEPS,
        step_lr=1e-4, final_only=True, denoise=True, log=False, verbose=False,
    )
    ours = np.asarray(sparse_anneal_langevin_dynamics(
        _duck_scorenet_apply, None, key, jnp.asarray(x), jnp.asarray(sparsity),
        jnp.asarray(cond), sigmas, n_steps_each=NSTEPS, step_lr=1e-4, denoise=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def _cas_noises(key, n_ladder, shape):
    """CAS draws one noise per ladder level except the last (ours:
    fold_in(rng, i))."""
    return [jax.random.normal(jax.random.fold_in(key, i), shape)
            for i in range(n_ladder - 1)]


def test_consistent_langevin_parity(setup):
    lib, sigmas, x, cond, net = setup
    from dyffusion_tpu.diffusion.mcvd import anneal_langevin_dynamics_consistent

    step_lr = float(sigmas[-1] ** 2)  # inside the stability window
    n_ladder = (L - 1) * NSTEPS + 1
    key = jax.random.key(3)
    noises = _cas_noises(key, n_ladder, x.shape)
    ref = _run_ref(
        lib.anneal_Langevin_dynamics_consistent, _NoiseQueue(noises),
        x_mod=torch.from_numpy(x.copy()), scorenet=net,
        cond=torch.from_numpy(cond), n_steps_each=NSTEPS, step_lr=step_lr,
        final_only=True, denoise=True, log=False, verbose=False,
    )
    ours = np.asarray(anneal_langevin_dynamics_consistent(
        _duck_scorenet_apply, None, key, jnp.asarray(x), jnp.asarray(cond),
        sigmas, n_steps_each=NSTEPS, step_lr=step_lr, denoise=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_sparse_consistent_langevin_parity(setup):
    lib, sigmas, x, cond, net = setup
    from dyffusion_tpu.diffusion.mcvd import sparse_anneal_langevin_dynamics_consistent

    sparsity = np.full((1, 1, 1, 1), 0.5, np.float32)
    step_lr = float(sigmas[-1] ** 2)
    n_ladder = (L - 1) * NSTEPS + 1
    key = jax.random.key(4)
    noises = _cas_noises(key, n_ladder, x.shape)
    ref = _run_ref(
        lib.sparse_anneal_Langevin_dynamics_consistent, _NoiseQueue(noises),
        x_mod_sparse=torch.from_numpy(x.copy()), sparsity=torch.from_numpy(sparsity),
        scorenet=net, cond=torch.from_numpy(cond), n_steps_each=NSTEPS,
        step_lr=step_lr, final_only=True, denoise=True, log=False, verbose=False,
    )
    ours = np.asarray(sparse_anneal_langevin_dynamics_consistent(
        _duck_scorenet_apply, None, key, jnp.asarray(x), jnp.asarray(sparsity),
        jnp.asarray(cond), sigmas, n_steps_each=NSTEPS, step_lr=step_lr, denoise=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_inpainting_langevin_parity(setup):
    """Ref hardcodes 3 channels + right-half-missing; ours generalizes to a
    known-pixel mask — parity on the exact configuration the ref supports.
    The ref returns every intermediate state (no final_only); compare the
    last one. Its video reshape: x_mod (B, F, 3, s, s), refer (B, 3, s, s)."""
    lib, sigmas, x, cond, net = setup
    from dyffusion_tpu.diffusion.mcvd import anneal_langevin_dynamics_inpainting

    size = HGT  # square
    cols = size // 2
    F = 2
    rng = np.random.default_rng(43)
    x5 = rng.normal(size=(B, F, 3, size, size)).astype(np.float32)
    refer = rng.normal(size=(B, 3, size, size)).astype(np.float32)
    cond_flat = rng.normal(size=(B * F, SC, size, size)).astype(np.float32)

    x_flat = x5.reshape(B * F, 3, size, size)
    refer_flat = np.broadcast_to(refer[:, None], (B, F, 3, size, size)).reshape(
        B * F, 3, size, size).copy()
    known = np.zeros((1, 1, 1, size), np.float32)
    known[..., :cols] = 1.0

    key = jax.random.key(5)
    # our per-step draws: corrupt (full refer shape) then langevin noise
    noises_ref = []
    for lk in jax.random.split(key, L):
        for sk in jax.random.split(lk, NSTEPS):
            k_c, k_n = jax.random.split(sk)
            corrupt = jax.random.normal(k_c, refer_flat.shape)
            noise = jax.random.normal(k_n, x_flat.shape)
            # ref draws the corruption on the HALF image only; values on the
            # known cols are what matters (the rest is masked out on our side)
            noises_ref += [np.asarray(corrupt)[..., :cols], np.asarray(noise)]

    queue = _NoiseQueue(noises_ref)
    orig_randn, orig_like = torch.randn, torch.randn_like
    torch.randn, torch.randn_like = queue.randn, queue.randn_like
    try:
        with torch.no_grad():
            ref_traj = lib.anneal_Langevin_dynamics_inpainting(
                x_mod=torch.from_numpy(x5.copy()),
                refer_image=torch.from_numpy(refer), scorenet=net,
                image_size=size, n_steps_each=NSTEPS, step_lr=1e-4,
                cond=torch.from_numpy(cond_flat), log=False,
            )
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like
    assert not queue.q

    # The ref appends BEFORE each update and never appends the final state
    # (ref :884-894): traj[-1] is the pre-update state of the last step.
    # Redo that last step with the same (already-drawn) noise arrays.
    step_lr = 1e-4
    sigma_last = float(sigmas[-1])
    xm = ref_traj[-1].clone()
    corrupt_half, noise_last = noises_ref[-2], noises_ref[-1]
    xm[..., :cols] = torch.from_numpy(
        refer_flat[..., :cols] + corrupt_half * sigma_last)
    labels = torch.full((B * F,), L - 1, dtype=torch.long)
    with torch.no_grad():
        grad = net(xm, labels, cond=torch.from_numpy(cond_flat))
    ref_final = (xm + step_lr * grad
                 + torch.from_numpy(noise_last) * np.sqrt(2.0 * step_lr)).numpy()

    ours = np.asarray(anneal_langevin_dynamics_inpainting(
        _duck_scorenet_apply, None, key, jnp.asarray(x_flat),
        jnp.asarray(refer_flat), jnp.asarray(known), jnp.asarray(cond_flat),
        sigmas, n_steps_each=NSTEPS, step_lr=step_lr))
    np.testing.assert_allclose(ours, ref_final, rtol=2e-4, atol=2e-5)


def test_interpolation_langevin_parity(setup):
    lib, sigmas, x, cond, net = setup
    from dyffusion_tpu.diffusion.mcvd import anneal_langevin_dynamics_interpolation

    n_interp = 3
    cond_rep = np.repeat(cond, n_interp, axis=0)
    key = jax.random.key(6)
    # per step: noise_p then noise_q, both on the UN-replicated (B,...) shape
    noises = _level_step_noises(key, L, NSTEPS, x.shape, per_step=2)
    ref = _run_ref(
        lib.anneal_Langevin_dynamics_interpolation, _NoiseQueue(noises),
        x_mod=torch.from_numpy(x.copy()), scorenet=net,
        n_interpolations=n_interp, n_steps_each=NSTEPS, step_lr=1e-4,
        cond=torch.from_numpy(cond_rep), final_only=True, log=False, verbose=False,
    )
    ours = np.asarray(anneal_langevin_dynamics_interpolation(
        _duck_scorenet_apply, None, key, jnp.asarray(x), n_interp,
        jnp.asarray(cond_rep), sigmas, n_steps_each=NSTEPS, step_lr=1e-4))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
