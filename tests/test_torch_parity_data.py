"""Data-layer golden parity vs the literal torch reference loader.

Writes a tiny dataset in the exact nn-benchmark on-disk layout (our
``write_fake_benchmark_dir``), loads it with the REFERENCE's
``TrajectoryDataset`` (``src/datamodules/datasets/physical_systems_benchmark
.py``) and windows it with the reference's literal
``create_dataset_multi_horizon`` (``src/datamodules/physical_systems_benchmark
.py:191-243``) bound to a duck instance — then compares element-wise against
our ``TrajectoryReader`` + sliding-window ``_build_split``. This pins both
(a) the fake layout's fidelity to what the reference parses and (b) the
sliding-window example construction (the deleted upstream
``test_windowed_data_loading_correctness`` recreated as measured parity,
SURVEY.md §4).
"""
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_import import import_reference

HORIZON, WINDOW = 4, 1


@pytest.fixture(scope="module", params=["spring-mesh", "navier-stokes"])
def roots(request, tmp_path_factory):
    from dyffusion_tpu.data.physical_systems import (
        PhysicalSystemsDataModule,
        write_fake_benchmark_dir,
    )

    system = request.param
    root = str(tmp_path_factory.mktemp(f"bench_{system}"))
    write_fake_benchmark_dir(root, physical_system=system,
                             n_traj={"train": 2, "val": 1, "test": 1}, n_time=9)
    dm = PhysicalSystemsDataModule(
        data_dir=root, physical_system=system, horizon=HORIZON, window=WINDOW)
    dm.setup()
    return system, dm


def _ref_windowed(system, train_dir):
    ds_mod = import_reference("src.datamodules.datasets.physical_systems_benchmark")
    dm_mod = import_reference("src.datamodules.physical_systems_benchmark")
    ref_ds = ds_mod.TrajectoryDataset(train_dir)
    duck = SimpleNamespace(
        hparams=SimpleNamespace(window=WINDOW, num_trajectories=None,
                                physical_system=system),
        get_horizon=lambda split: HORIZON,
    )
    return dm_mod.PhysicalSystemsBenchmarkDataModule.create_dataset_multi_horizon(
        duck, "train", ref_ds)


def test_windowed_dynamics_match_literal_reference(roots):
    system, dm = roots
    ref = _ref_windowed(system, dm._split_dir("train"))
    ours = dm.split("train").tensors

    # ref dynamics: (n_ex, window+horizon, C, H, W); ours NHWC
    ours_nchw = np.moveaxis(ours["dynamics"], -1, 2)
    np.testing.assert_allclose(ours_nchw, ref["dynamics"], rtol=1e-6, atol=1e-7,
                               err_msg="sliding-window dynamics differ")

    # condition = extra_fixed_mask replicated per example
    ref_cond = np.asarray(ref["condition"], np.float32)
    ours_cond = np.moveaxis(ours["condition"], -1, 1)
    np.testing.assert_allclose(ours_cond, ref_cond, rtol=1e-6, atol=1e-7,
                               err_msg="replicated condition differs")


def test_trajectory_fields_match_literal_reference(roots):
    """Per-trajectory fields our metadata pipeline consumes (fixed_mask,
    boundary inputs) equal the reference loader's view of the same files."""
    system, dm = roots
    ds_mod = import_reference("src.datamodules.datasets.physical_systems_benchmark")
    ref_ds = ds_mod.TrajectoryDataset(dm._split_dir("train"))
    ref0 = ref_ds[0]
    ours = dm.split("train").tensors

    # fixed_mask: ref (C, H, W) bool; ours replicated (n_ex, H, W, C)
    np.testing.assert_array_equal(
        np.moveaxis(ours["metadata_fixed_mask"][0], -1, 0),
        np.asarray(ref0.fixed_mask).astype(bool))

    if system == "navier-stokes":
        # vertex_y our boundary hook reads == ref vertices[1, 0, :]
        np.testing.assert_allclose(
            ours["metadata_vertex_y"][0], np.asarray(ref0.vertices)[1, 0, :],
            rtol=1e-6)
        np.testing.assert_allclose(
            ours["metadata_in_velocity"][0],
            float(ref0.trajectory_meta["in_velocity"]), rtol=1e-6)
    else:
        # base_q our pinning reads == ref features[0, 2:] (first step, q)
        np.testing.assert_allclose(
            np.moveaxis(ours["metadata_base_q"][0], -1, 0),
            np.asarray(ref0.features)[0, 2:], rtol=1e-6)

    # time metadata
    np.testing.assert_allclose(ours["metadata_t0"][0], np.asarray(ref0.t)[0], rtol=1e-6)
    np.testing.assert_allclose(
        ours["metadata_dt"][0], float(ref0.trajectory_meta["time_step_size"]), rtol=1e-6)
