"""Physical-systems data layer: npz parsing, sliding windows, boundary
conditions, and an end-to-end spring-mesh slice through the real loader.

Recreates the sliding-window equivalence test the reference deleted
(``tests/test_windowed_data_loading_correctness.py`` referenced at
``oisstv2.py:272``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyffusion_tpu.data.base import sliding_window_multi_horizon
from dyffusion_tpu.data.physical_systems import (
    PhysicalSystemsDataModule,
    TrajectoryReader,
    write_fake_benchmark_dir,
)


@pytest.fixture(scope="module")
def spring_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bench"))
    write_fake_benchmark_dir(root, "spring-mesh", n_time=16)
    return root


@pytest.fixture(scope="module")
def ns_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bench_ns"))
    write_fake_benchmark_dir(root, "navier-stokes", n_time=10)
    return root


def test_sliding_window_equivalence_vs_naive_loop():
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(12, 5, 6, 2)).astype(np.float32)
    w, h = 2, 3
    got = sliding_window_multi_horizon(traj, w, h)
    assert got.shape == (12 - 5 + 1, 5, 5, 6, 2)
    for i in range(got.shape[0]):
        np.testing.assert_array_equal(got[i], traj[i : i + w + h])


def test_trajectory_reader_parses_fake_layout(spring_root):
    dm = PhysicalSystemsDataModule(data_dir=spring_root, physical_system="spring-mesh", horizon=4)
    reader = TrajectoryReader(dm._split_dir("train"))
    assert len(reader) == 3
    tr = reader.get(0)
    assert tr["features"].shape == (16, 10, 10, 4)  # NHWC, p(2)+q(2)
    assert tr["fixed_mask"].shape == (10, 10, 4)
    assert tr["condition"].shape == (10, 10, 1)
    assert tr["t"].shape == (16,)


def test_datamodule_builds_splits_with_metadata(spring_root):
    dm = PhysicalSystemsDataModule(
        data_dir=spring_root, physical_system="spring-mesh", horizon=4, batch_size=4
    )
    dm.setup()
    tr = dm.split("train")
    n_ex_per_traj = 16 - (1 + 4) + 1
    assert len(tr) == 3 * n_ex_per_traj
    batch = next(iter(dm.train_batches()))
    assert batch["dynamics"].shape == (4, 5, 10, 10, 4)
    assert batch["condition"].shape == (4, 10, 10, 1)
    assert batch["metadata_fixed_mask"].dtype == bool
    assert batch["metadata_base_q"].shape == (4, 10, 10, 2)
    # test batches are single full trajectories (ref
    # physical_systems_benchmark.py:50: test_batch_size = 1)
    test_batch = next(iter(dm.test_batches()))
    assert test_batch["dynamics"].shape[0] == 1


def test_spring_mesh_boundary_conditions(spring_root):
    dm = PhysicalSystemsDataModule(data_dir=spring_root, physical_system="spring-mesh", horizon=4)
    dm.setup()
    batch = {k: jnp.asarray(v[:2]) for k, v in dm.split("val").tensors.items()}
    preds = jnp.ones((3, 2, 10, 10, 4)) * 9.0  # (ensemble, B, H, W, C)
    out = dm.boundary_conditions(preds, metadata=batch)
    fixed = np.asarray(batch["metadata_fixed_mask"])  # (B, H, W, 4)
    out = np.asarray(out)
    # pinned p-channels forced to 0, pinned q-channels to base_q
    base_q = np.asarray(batch["metadata_base_q"])
    for b in range(2):
        assert np.all(out[:, b][..., :2][:, fixed[b][..., :2]] == 0.0)
        got_q = out[0, b][..., 2:][fixed[b][..., 2:]]
        want_q = base_q[b][fixed[b][..., 2:]]
        np.testing.assert_allclose(got_q, want_q)
    # unpinned entries untouched
    assert np.all(out[:, :][~np.broadcast_to(fixed, out.shape)] == 9.0)


def test_navier_stokes_boundary_conditions(ns_root):
    dm = PhysicalSystemsDataModule(
        data_dir=ns_root, physical_system="navier-stokes", horizon=4
    )
    dm.setup()
    batch = {k: jnp.asarray(v[:2]) for k, v in dm.split("val").tensors.items()}
    preds = jnp.full((2, 221, 42, 3), 7.0)
    out = np.asarray(dm.boundary_conditions(preds, metadata=batch, time=jnp.asarray([0.5, 1.0])))
    fixed = np.asarray(batch["metadata_fixed_mask"])
    v = np.asarray(batch["metadata_in_velocity"])
    vy = np.asarray(batch["metadata_vertex_y"])
    for b in range(2):
        t = [0.5, 1.0][b]
        expected_lb = v[b] * 4 * vy[b] * (0.41 - vy[b]) / 0.41**2 * (1 - np.exp(-5 * t))
        np.testing.assert_allclose(out[b, 0, :, 0], expected_lb, rtol=1e-5)
        # fixed mask zeros (outside the inflow row)
        inner = fixed[b, 1:, :, :]
        assert np.all(out[b, 1:, :, :][inner] == 0.0)


def test_spring_mesh_end_to_end_interpolation_slice(spring_root):
    """Train one step of stage-1 interpolation through the real loader
    (SURVEY.md §7.2 step 4, scaled down)."""
    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import build_experiment, create_train_state, get_datamodule
    from dyffusion_tpu.training.trainer import make_train_step

    cfg = get_config(
        "spring_mesh_interpolation",
        [
            f"datamodule.data_dir={spring_root}",
            "datamodule.horizon=4",
            "datamodule.prediction_horizon=8",
            "datamodule.batch_size=4",
            "model.dim=16",
            "module.num_predictions=2",
            "trainer.save_checkpoints=False",
        ],
    )
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, _ = build_experiment(cfg, dm)
    state = create_train_state(cfg, variables)
    step = make_train_step(loss_fn)
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.train_batches())).items()}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # batch-norm stats updated through the train step
    leaf = jax.tree_util.tree_leaves(state.model_state["batch_stats"])[0]
    assert not np.allclose(np.asarray(leaf), 0.0)
    out = jax.jit(eval_fns["val"])(state.eval_variables(), batch, jax.random.key(0))
    assert out["t1_preds"].shape[0] == 2  # ensemble members


def test_build_split_clear_error_when_condition_missing(spring_root, monkeypatch):
    """An archive trajectory without 'extra_fixed_mask' must raise a clear
    ValueError, not an obscure float(None) TypeError."""
    dm = PhysicalSystemsDataModule(data_dir=spring_root, physical_system="spring-mesh", horizon=4)
    orig_get = TrajectoryReader.get

    def get_no_condition(self, idx):
        tr = orig_get(self, idx)
        tr["condition"] = None
        return tr

    monkeypatch.setattr(TrajectoryReader, "get", get_no_condition)
    with pytest.raises(ValueError, match="extra_fixed_mask"):
        dm.setup("train")
