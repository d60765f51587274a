"""Backbone tests: shapes, conditioning, time embedding, MC-dropout."""
import jax
import jax.numpy as jnp
import pytest

from dyffusion_tpu.models import (
    BackboneSpec,
    SimpleConvNet,
    UNetSimple,
    Unet,
    init_backbone,
    make_apply_fn,
    make_train_apply_fn,
)


def _spec(c_in=3, c_out=3, c_cond=0, hw=(16, 16), time=True):
    return BackboneSpec(c_in, c_out, c_cond, hw, with_time_emb=time)


def test_unet_shapes_and_conditioning():
    spec = _spec(c_in=2, c_out=4, c_cond=3, hw=(16, 16))
    model = Unet(
        dim=8,
        num_input_channels=2,
        num_output_channels=4,
        num_conditional_channels=3,
        dim_mults=(1, 2),
        with_time_emb=True,
    )
    params = init_backbone(model, spec, jax.random.key(0))
    apply_fn = make_apply_fn(model)
    x = jnp.ones((2, 16, 16, 2))
    cond = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1.0, 2.0])
    y = apply_fn(params, x, t, cond)
    assert y.shape == (2, 16, 16, 4)
    assert jnp.all(jnp.isfinite(y))


def test_unet_odd_spatial_dims_with_outer_resample():
    # awkward grid handled by the outer resampling wrapper (ref unet.py:151-157)
    spec = _spec(c_in=1, c_out=1, hw=(15, 9))
    model = Unet(
        dim=8,
        num_input_channels=1,
        num_output_channels=1,
        dim_mults=(1, 2),
        with_time_emb=True,
        outer_sample_mode="bilinear",
        upsample_dims=(16, 16),
    )
    params = init_backbone(model, spec, jax.random.key(0))
    y = make_apply_fn(model)(params, jnp.ones((1, 15, 9, 1)), jnp.array([0.5]), None)
    assert y.shape == (1, 15, 9, 1)


def test_unet_mc_dropout_stochastic():
    spec = _spec(c_in=1, c_out=1, hw=(8, 8))
    model = Unet(
        dim=8,
        num_input_channels=1,
        num_output_channels=1,
        dim_mults=(1,),
        with_time_emb=True,
        block_dropout=0.5,
        input_dropout=0.2,
    )
    params = init_backbone(model, spec, jax.random.key(0))
    apply_fn = make_apply_fn(model)
    x = jnp.ones((1, 8, 8, 1))
    t = jnp.array([1.0])
    det1 = apply_fn(params, x, t, None)
    det2 = apply_fn(params, x, t, None)
    assert jnp.allclose(det1, det2)  # no rng => deterministic
    s1 = apply_fn(params, x, t, None, dropout_rng=jax.random.key(1))
    s2 = apply_fn(params, x, t, None, dropout_rng=jax.random.key(2))
    assert not jnp.allclose(s1, s2)  # MC-dropout active with a live rng


def test_simple_conv_net_batchnorm_train_apply():
    spec = _spec(c_in=4, c_out=4, c_cond=1, hw=(10, 10))
    model = SimpleConvNet(
        dim=16,
        num_input_channels=4,
        num_output_channels=4,
        num_conditional_channels=1,
        with_time_emb=True,
        net_normalization="batch_norm",
    )
    variables = init_backbone(model, spec, jax.random.key(0))
    assert "batch_stats" in variables
    train_apply = make_train_apply_fn(model, has_batch_stats=True)
    x = jax.random.normal(jax.random.key(1), (4, 10, 10, 4))
    cond = jnp.zeros((4, 10, 10, 1))
    t = jnp.ones((4,))
    y, updates = train_apply(variables, x, t, cond, dropout_rng=jax.random.key(2))
    assert y.shape == (4, 10, 10, 4)
    assert "batch_stats" in updates
    # stats moved away from init zeros
    leaf = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert not jnp.allclose(leaf, jnp.zeros_like(leaf))
    # inference apply uses running stats, no mutation
    y2 = make_apply_fn(model)(variables, x, t, cond)
    assert y2.shape == (4, 10, 10, 4)


def test_unet_simple_navier_stokes_shape():
    # NS grid 221x42 with outer bilinear resample to 256x256 (ref unet_simple.py:98-101)
    spec = _spec(c_in=3, c_out=3, c_cond=2, hw=(221, 42), time=False)
    model = UNetSimple(
        dim=8,
        num_input_channels=3,
        num_output_channels=3,
        num_conditional_channels=2,
        upsample_dims=(64, 64),
        with_time_emb=False,
    )
    variables = init_backbone(model, spec, jax.random.key(0))
    y = make_apply_fn(model)(
        variables, jnp.ones((1, 221, 42, 3)), None, jnp.zeros((1, 221, 42, 2))
    )
    assert y.shape == (1, 221, 42, 3)
