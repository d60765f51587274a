"""Spatial (model-axis) sharding on the virtual 8-device CPU mesh.

Beyond-reference scaling (SURVEY.md §5.7 names spatial sharding of the conv
UNet as the idiomatic TPU extension; the reference itself is DP-only): batches
are sharded on their spatial H axis over the mesh's 'model' axis
(``parallel.mesh.value_sharding``) and XLA's GSPMD partitioner inserts the
conv halo exchanges / attention collectives. Params stay replicated.

These tests assert (1) the rank->spec routing, (2) forward equivalence of an
H-sharded UNet vs single-device, (3) the REAL driver path
(``trainer.spatial_shards``) training + evaluating to the same result as a
pure-data-parallel run.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment
from dyffusion_tpu.parallel import make_mesh, shard_train_state, value_sharding

TINY = [
    "datamodule.n_traj=4",
    "datamodule.n_time=14",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=4",
    "datamodule.batch_size=8",
    "datamodule.eval_batch_size=8",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "model.block_dropout=0.2",
    "module.num_predictions=2",
    "module.num_predictions_test=2",
    "trainer.save_checkpoints=False",
    "trainer.max_epochs=1",
]


def test_value_sharding_rank_routing():
    mesh = make_mesh(n_data=2, n_model=4)
    # spatial off: everything rows-only
    assert value_sharding(mesh, 5, spatial=False).spec == P("data")
    # spatial on: H (= ndim-3) over 'model' for grid values only
    assert value_sharding(mesh, 4, spatial=True).spec == P("data", "model")
    assert value_sharding(mesh, 5, spatial=True).spec == P("data", None, "model")
    for ndim in (1, 2, 3):
        assert value_sharding(mesh, ndim, spatial=True).spec == P("data")


def test_unet_forward_spatially_sharded_matches_single_device():
    from dyffusion_tpu.models import Unet

    model = Unet(
        dim=8, num_input_channels=2, num_output_channels=2,
        num_conditional_channels=0, dim_mults=(1, 2), with_time_emb=True,
    )
    x = np.random.RandomState(0).randn(8, 16, 16, 2).astype(np.float32)
    t = np.arange(8).astype(np.float32)
    v = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t))
    f = jax.jit(lambda v, x, t: model.apply(v, x, t))
    ref = np.asarray(f(v, jnp.asarray(x), jnp.asarray(t)))

    mesh = make_mesh(n_data=2, n_model=4)
    out_arr = f(
        shard_train_state(v, mesh),
        jax.device_put(x, value_sharding(mesh, 4, spatial=True)),
        jax.device_put(t, value_sharding(mesh, 1, spatial=True)),
    )
    np.testing.assert_allclose(np.asarray(out_arr), ref, atol=1e-5)
    # GSPMD keeps the spatial layout through the whole ladder (down/attn/up)
    assert out_arr.sharding.spec == P("data", "model")


def test_driver_spatial_shards_matches_data_parallel(tmp_path):
    """The REAL driver with trainer.devices=8 + trainer.spatial_shards=4
    (2x4 mesh, data axis 2) reproduces the devices=2 pure-DP run: identical
    science (same global batch = per-device x n_data), different
    partitioning."""
    results = {}
    meshes = {}
    for tag, extra in (
        ("dp", ["trainer.devices=2"]),
        ("spatial", ["trainer.devices=8", "trainer.spatial_shards=4"]),
    ):
        cfg = get_config(
            "synthetic_interpolation",
            TINY + extra + [f"registry_dir={tmp_path}/{tag}"],
        )
        trainer, best = run_experiment(cfg)
        results[tag] = best
        meshes[tag] = trainer.mesh
    assert int(meshes["spatial"].shape["model"]) == 4
    assert int(meshes["spatial"].shape["data"]) == 2
    assert np.isfinite(results["dp"]) and np.isfinite(results["spatial"])
    np.testing.assert_allclose(results["spatial"], results["dp"], rtol=2e-4)


def test_driver_stage2_spatial_shards(tmp_path):
    """Stage-2 DYffusion under dp x sp: the frozen-interpolator handoff, the
    two-term p_losses and the scan-based cold sampler all run with the H axis
    sharded over 'model' (GSPMD-partitioned), finishing finite."""
    cfg1 = get_config(
        "synthetic_interpolation",
        TINY + ["trainer.devices=4", "trainer.spatial_shards=2",
                "trainer.save_checkpoints=True",  # the handoff needs the ckpt
                f"registry_dir={tmp_path}"],
    )
    trainer1, best1 = run_experiment(cfg1)
    assert np.isfinite(best1)
    import os

    run_id = os.path.basename(trainer1.ckpt.run_dir) if trainer1.ckpt else None
    assert run_id, "stage-1 must save a checkpoint for the handoff"
    cfg2 = get_config(
        "synthetic_dyffusion",
        TINY + ["trainer.devices=4", "trainer.spatial_shards=2",
                f"registry_dir={tmp_path}",
                f"diffusion.interpolator_run_id={run_id}"],
    )
    trainer2, best2 = run_experiment(cfg2)
    assert int(trainer2.mesh.shape["model"]) == 2
    assert np.isfinite(best2)


def test_spatial_shards_must_divide_grid_height(tmp_path):
    """An H the shards don't divide fails up front with actionable guidance
    (device_put would otherwise reject the first batch deep in the loop)."""
    cfg = get_config(
        "synthetic_interpolation",
        TINY + [
            "datamodule.spatial=(9,8)",  # H=9, not divisible by 4
            "trainer.devices=8",
            "trainer.spatial_shards=4",
            f"registry_dir={tmp_path}",
        ],
    )
    with pytest.raises(AssertionError, match="divide the grid height"):
        run_experiment(cfg)


def test_value_sharding_w_axis():
    mesh = make_mesh(n_data=2, n_model=4)
    assert value_sharding(mesh, 4, spatial=True, axis="w").spec == P("data", None, "model")
    assert value_sharding(mesh, 5, spatial=True, axis="w").spec == P("data", None, None, "model")
    assert value_sharding(mesh, 2, spatial=True, axis="w").spec == P("data")


def test_unet_forward_w_sharded_matches_single_device():
    """W-axis sharding (trainer.spatial_axis='w') — for grids whose H has no
    useful divisors (Navier-Stokes 221x42): 12-wide W over 4 shards."""
    from dyffusion_tpu.models import Unet

    model = Unet(
        dim=8, num_input_channels=2, num_output_channels=2,
        num_conditional_channels=0, dim_mults=(1, 2), with_time_emb=True,
    )
    x = np.random.RandomState(1).randn(4, 10, 12, 2).astype(np.float32)
    t = np.arange(4).astype(np.float32)
    v = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t))
    f = jax.jit(lambda v, x, t: model.apply(v, x, t))
    ref = np.asarray(f(v, jnp.asarray(x), jnp.asarray(t)))

    mesh = make_mesh(n_data=2, n_model=4)
    out = f(
        shard_train_state(v, mesh),
        jax.device_put(x, value_sharding(mesh, 4, spatial=True, axis="w")),
        jax.device_put(t, value_sharding(mesh, 1, spatial=True, axis="w")),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_driver_spatial_axis_w(tmp_path):
    """Full driver with trainer.spatial_axis=w on a grid whose H (9) does NOT
    divide by the shards but whose W (8) does — proves both the guard and the
    batch sharding follow the configured axis."""
    cfg = get_config(
        "synthetic_interpolation",
        TINY + [
            "datamodule.spatial=(9,8)",
            "trainer.devices=4",
            "trainer.spatial_shards=2",
            "trainer.spatial_axis=w",
            "trainer.max_steps=2",
            f"registry_dir={tmp_path}",
        ],
    )
    trainer, best = run_experiment(cfg)
    assert int(trainer.mesh.shape["model"]) == 2
    assert np.isfinite(best)
