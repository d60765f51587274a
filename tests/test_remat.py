"""model.remat=true — block-granular rematerialization (jax.checkpoint).

Remat is a pure execution-schedule change: the backward recomputes each
block's internal activations instead of holding them in HBM. These tests pin
the equivalence contract — identical param trees, same forwards (including
live dropout: the lifted transform replays the same rng draws) and gradients
to float-reassociation tolerance (the recompute can fuse differently, so
values drift at ~6e-4 RELATIVE worst-case — measured, not semantic), and identical
BatchNorm running-stat updates — plus the real driver accepting the flag.
The memory effect itself is measured on the TPU
(scripts/bench_fold_remat.py, PERF.md).
"""
import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment
from dyffusion_tpu.models import Unet
from dyffusion_tpu.models.unet_simple import UNetSimple


def _tree_allclose(a, b, rtol=0.0, atol=0.0):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=rtol)


def test_unet_remat_exact_forward_and_grads():
    kw = dict(
        dim=8, num_input_channels=2, num_output_channels=2,
        num_conditional_channels=0, dim_mults=(1, 2), with_time_emb=True,
        block_dropout=0.3, attn_dropout=0.1,
    )
    base, rem = Unet(**kw), Unet(**kw, remat=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 2).astype(np.float32))
    t = jnp.arange(2).astype(jnp.float32)

    v0 = base.init(jax.random.key(0), x, t)
    v1 = rem.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    _tree_allclose(v0, v1)

    # live dropout: remat must replay the SAME draws in fwd and recompute
    rngs = {"dropout": jax.random.key(7)}

    def loss(model):
        def f(v):
            out = model.apply(v, x, t, deterministic=False, rngs=rngs)
            return jnp.sum(out**2)
        return f

    o0, g0 = jax.value_and_grad(loss(base))(v0)
    o1, g1 = jax.value_and_grad(loss(rem))(v0)
    np.testing.assert_allclose(float(o0), float(o1), rtol=1e-5)
    # float-reassociation tolerance: the recompute fuses differently, so
    # values drift — measured worst ~6e-4 relative on a handful of elements
    _tree_allclose(g0, g1, rtol=2e-3, atol=1e-4)


def test_unet_simple_remat_exact_with_batchnorm():
    kw = dict(
        dim=4, num_input_channels=2, num_output_channels=2,
        num_conditional_channels=0, with_time_emb=True,
        upsample_dims=(64, 64), dropout=0.2,
    )
    base, rem = UNetSimple(**kw), UNetSimple(**kw, remat=True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 10, 12, 2).astype(np.float32))
    t = jnp.arange(2).astype(jnp.float32)

    v0 = base.init(jax.random.key(0), x, t)
    v1 = rem.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    _tree_allclose(v0, v1)

    rngs = {"dropout": jax.random.key(3)}

    def run(model, v):
        def f(params):
            out, updates = model.apply(
                {"params": params, **{k: w for k, w in v.items() if k != "params"}},
                x, t, deterministic=False, train=True,
                rngs=rngs, mutable=["batch_stats"],
            )
            return jnp.sum(out**2), updates
        (val, updates), grads = jax.value_and_grad(f, has_aux=True)(v["params"])
        return val, updates, grads

    o0, u0, g0 = run(base, v0)
    o1, u1, g1 = run(rem, v0)
    np.testing.assert_allclose(float(o0), float(o1), rtol=1e-5)
    _tree_allclose(g0, g1, rtol=1e-4, atol=1e-5)
    # BatchNorm running-stat updates must come through the lifted transform
    _tree_allclose(u0, u1, rtol=1e-5, atol=1e-6)


def test_ncsnpp_remat_exact_forward_and_grads():
    from dyffusion_tpu.models.ncsnpp import NCSNpp

    kw = dict(
        dim=8, num_input_channels=2, num_output_channels=2,
        num_conditional_channels=0, dim_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(4,), dropout=0.3, spatial_height=8,
        n_head_channels=8,
    )
    base, rem = NCSNpp(**kw), NCSNpp(**kw, remat=True)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 2).astype(np.float32))
    t = jnp.arange(2).astype(jnp.float32)

    v0 = base.init(jax.random.key(0), x, t)
    v1 = rem.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    _tree_allclose(v0, v1)

    rngs = {"dropout": jax.random.key(5)}

    def loss(model):
        def f(v):
            out = model.apply(v, x, t, deterministic=False, rngs=rngs)
            return jnp.sum(out**2)
        return f

    o0, g0 = jax.value_and_grad(loss(base))(v0)
    o1, g1 = jax.value_and_grad(loss(rem))(v0)
    np.testing.assert_allclose(float(o0), float(o1), rtol=1e-5)
    _tree_allclose(g0, g1, rtol=2e-3, atol=1e-4)


def test_spade_ncsnpp_remat_exact_forward_and_grads():
    from dyffusion_tpu.models.ncsnpp import SPADENCSNpp

    kw = dict(
        dim=8, num_input_channels=2, num_output_channels=2,
        num_conditional_channels=3, spade_dim=8, dim_mults=(1, 2),
        num_res_blocks=1, attn_resolutions=(4,), dropout=0.3,
        spatial_height=8, n_head_channels=8,
    )
    base, rem = SPADENCSNpp(**kw), SPADENCSNpp(**kw, remat=True)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 8, 8, 2).astype(np.float32))
    cond = jnp.asarray(rs.randn(2, 8, 8, 3).astype(np.float32))
    t = jnp.arange(2).astype(jnp.float32)

    v0 = base.init(jax.random.key(0), x, t, cond)
    v1 = rem.init(jax.random.key(0), x, t, cond)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    _tree_allclose(v0, v1)

    rngs = {"dropout": jax.random.key(9)}

    def loss(model):
        def f(v):
            out = model.apply(v, x, t, cond, deterministic=False, rngs=rngs)
            return jnp.sum(out**2)
        return f

    o0, g0 = jax.value_and_grad(loss(base))(v0)
    o1, g1 = jax.value_and_grad(loss(rem))(v0)
    np.testing.assert_allclose(float(o0), float(o1), rtol=1e-5)
    _tree_allclose(g0, g1, rtol=2e-3, atol=1e-4)


def test_driver_accepts_model_remat(tmp_path):
    cfg = get_config(
        "synthetic_interpolation",
        [
            "datamodule.n_traj=4", "datamodule.n_time=14",
            "datamodule.spatial=(8,8)", "datamodule.channels=1",
            "datamodule.horizon=4", "datamodule.batch_size=4",
            "datamodule.eval_batch_size=4",
            "model.dim=8", "model.dim_mults=(1,)", "model.block_dropout=0.2",
            "model.remat=True",
            "module.num_predictions=2",
            "trainer.save_checkpoints=False", "trainer.max_steps=2",
            "trainer.max_epochs=1",
            f"registry_dir={tmp_path}",
        ],
    )
    trainer, best = run_experiment(cfg)
    assert np.isfinite(best)
