"""Boundary-condition physics golden parity vs the literal torch reference.

The reference re-imposes physical boundary conditions on predictions with
per-batch-element python loops and in-place boolean-mask writes
(``src/datamodules/physical_systems_benchmark.py:245-297``); ours is a
vectorized jittable ``jnp.where`` formulation (NHWC). These tests bind the
reference method to a duck instance and compare element-wise on random data:

- Navier-Stokes: zero the fixed-mask cells, then write the time-dependent
  parabolic inflow profile ``v*4*y*(0.41-y)/0.41^2 * (1-exp(-5t))`` into
  channel 0 of row 0;
- spring-mesh: pin (p=0, q=base_q) wherever the 4-channel fixed mask is set,
  incl. the 5-D ensemble-leading-axis layout.
"""
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests._reference_import import import_reference

B, H, W = 3, 12, 7  # spring-mesh formulas are shape-generic
# the reference HARDCODES the NS grid (zeros((3, 221, 42)), ref :264)
NS_H, NS_W = 221, 42


def _ref_dm_class():
    mod = import_reference("src.datamodules.physical_systems_benchmark")
    return mod.PhysicalSystemsBenchmarkDataModule


def _our_dm(system):
    from dyffusion_tpu.data.physical_systems import PhysicalSystemsDataModule

    dm = PhysicalSystemsDataModule.__new__(PhysicalSystemsDataModule)
    dm.physical_system = system
    return dm


def _nhwc(x):  # (B, C, H, W) -> (B, H, W, C)
    return jnp.asarray(np.moveaxis(x, 1, -1))


def _nchw(x):  # back for comparison
    return np.moveaxis(np.asarray(x), -1, 1)


def test_navier_stokes_boundary_parity():
    rng = np.random.default_rng(11)
    preds = rng.normal(size=(B, 3, NS_H, NS_W)).astype(np.float32)
    fixed = rng.random((B, 3, NS_H, NS_W)) < 0.2
    in_velocity = rng.uniform(0.5, 1.5, (B,)).astype(np.float32)
    vertices = rng.uniform(0.0, 0.41, (B, 2, NS_H, NS_W)).astype(np.float32)
    time = np.array([0.5, 1.0, 2.5], np.float32)

    RefDM = _ref_dm_class()
    duck = SimpleNamespace(hparams=SimpleNamespace(physical_system="navier-stokes"))
    metadata = {
        "in_velocity": torch.from_numpy(in_velocity),
        "fixed_mask": torch.from_numpy(fixed),
        "vertices": torch.from_numpy(vertices),
    }
    ref_preds = torch.from_numpy(preds.copy())
    with torch.no_grad():
        ref_out = RefDM.boundary_conditions(
            duck, ref_preds, torch.from_numpy(preds.copy()), metadata,
            time=torch.from_numpy(time),
        ).numpy()

    dm = _our_dm("navier-stokes")
    ours = dm.boundary_conditions(
        _nhwc(preds),
        metadata={
            "metadata_fixed_mask": np.moveaxis(fixed, 1, -1),
            "metadata_in_velocity": in_velocity,
            "metadata_vertex_y": vertices[:, 1, 0, :],  # ref reads [b, 1, 0, :]
        },
        time=jnp.asarray(time),
    )
    np.testing.assert_allclose(_nchw(ours), ref_out, rtol=1e-6, atol=1e-7)


def test_navier_stokes_boundary_parity_scalar_time():
    rng = np.random.default_rng(13)
    preds = rng.normal(size=(B, 3, NS_H, NS_W)).astype(np.float32)
    fixed = rng.random((B, 3, NS_H, NS_W)) < 0.3
    in_velocity = rng.uniform(0.5, 1.5, (B,)).astype(np.float32)
    vertices = rng.uniform(0.0, 0.41, (B, 2, NS_H, NS_W)).astype(np.float32)

    RefDM = _ref_dm_class()
    duck = SimpleNamespace(hparams=SimpleNamespace(physical_system="navier-stokes"))
    metadata = {
        "in_velocity": torch.from_numpy(in_velocity),
        "fixed_mask": torch.from_numpy(fixed),
        "vertices": torch.from_numpy(vertices),
    }
    with torch.no_grad():
        ref_out = RefDM.boundary_conditions(
            duck, torch.from_numpy(preds.copy()), torch.from_numpy(preds.copy()),
            metadata, time=0.75,
        ).numpy()

    dm = _our_dm("navier-stokes")
    ours = dm.boundary_conditions(
        _nhwc(preds),
        metadata={
            "metadata_fixed_mask": np.moveaxis(fixed, 1, -1),
            "metadata_in_velocity": in_velocity,
            "metadata_vertex_y": vertices[:, 1, 0, :],
        },
        time=0.75,
    )
    np.testing.assert_allclose(_nchw(ours), ref_out, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("ensemble_axis", [False, True])
def test_spring_mesh_boundary_parity(ensemble_axis):
    rng = np.random.default_rng(17)
    N = 2  # ensemble members for the 5-D layout
    shape = (N, B, 4, H, W) if ensemble_axis else (B, 4, H, W)
    preds = rng.normal(size=shape).astype(np.float32)
    fixed = rng.random((B, 4, H, W)) < 0.25
    # ref reads base_q = features[b, 0, 2:]: first time step, q channels
    features = rng.normal(size=(B, 5, 4, H, W)).astype(np.float32)

    RefDM = _ref_dm_class()
    duck = SimpleNamespace(hparams=SimpleNamespace(physical_system="spring-mesh"))
    metadata = {
        "fixed_mask": torch.from_numpy(fixed),
        "features": torch.from_numpy(features),
    }
    targets = torch.from_numpy(np.zeros((B, 4, H, W), np.float32))
    with torch.no_grad():
        ref_out = RefDM.boundary_conditions(
            duck, torch.from_numpy(preds.copy()), targets, metadata,
        ).numpy()

    dm = _our_dm("spring-mesh")
    md = {
        "metadata_fixed_mask": np.moveaxis(fixed, 1, -1),
        "metadata_base_q": np.moveaxis(features[:, 0, 2:], 1, -1),
    }
    if ensemble_axis:
        ours = dm.boundary_conditions(jnp.asarray(np.moveaxis(preds, 2, -1)), metadata=md)
        np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 2), ref_out, rtol=1e-6)
    else:
        ours = dm.boundary_conditions(_nhwc(preds), metadata=md)
        np.testing.assert_allclose(_nchw(ours), ref_out, rtol=1e-6)
