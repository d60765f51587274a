"""Synthetic spatiotemporal trajectories for tests and benchmarks.

The reference's datasets require multi-GB downloads (NYU archive / Zenodo;
``scripts/download_*.sh``). This module generates hermetic stand-ins with the
same tensor layout and statistics profile: smooth advecting/diffusing 2-D
fields with per-trajectory parameters — enough structure that interpolation
and forecasting are learnable, which the end-to-end tests rely on.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from dyffusion_tpu.data.base import DataModule, DatasetSplit, build_examples


def make_synthetic_trajectories(
    n_traj: int,
    n_time: int,
    spatial: Tuple[int, int] = (16, 16),
    channels: int = 2,
    seed: int = 0,
) -> np.ndarray:
    """Traveling-wave fields: x(t) = sum_k a_k sin(k·r - w_k t + phi_k).

    Smooth in time (so linear-ish interpolation is learnable) and diverse
    across trajectories. Returns (n_traj, n_time, H, W, C) float32.
    """
    rng = np.random.default_rng(seed)
    H, W = spatial
    yy, xx = np.meshgrid(np.linspace(0, 2 * np.pi, H), np.linspace(0, 2 * np.pi, W), indexing="ij")
    out = np.zeros((n_traj, n_time, H, W, channels), np.float32)
    n_modes = 3
    for i in range(n_traj):
        for c in range(channels):
            field = np.zeros((n_time, H, W), np.float32)
            for _ in range(n_modes):
                kx, ky = rng.integers(1, 3, size=2)
                w = rng.uniform(0.05, 0.25)
                phi = rng.uniform(0, 2 * np.pi)
                amp = rng.uniform(0.3, 1.0)
                t = np.arange(n_time)[:, None, None]
                field += amp * np.sin(kx * xx + ky * yy - w * t + phi).astype(np.float32)
            out[i, :, :, :, c] = field
    return out


class SyntheticDataModule(DataModule):
    """In-memory datamodule over synthetic trajectories, with an optional
    static condition channel (a fixed spatial mask, mimicking the physical
    benchmarks' condition tensors)."""

    def __init__(
        self,
        n_traj: int = 8,
        n_time: int = 48,
        spatial: Tuple[int, int] = (16, 16),
        channels: int = 2,
        conditional_channels: int = 0,
        seed: int = 0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.n_traj = n_traj
        self.n_time = n_time
        self.spatial = tuple(spatial)
        self.channels = channels
        self.conditional_channels = conditional_channels
        self.seed = seed

    @property
    def dims(self) -> Dict:
        return {
            "input": self.channels,
            "output": self.channels,
            "conditional": self.conditional_channels,
            "spatial": self.spatial,
        }

    def get_horizon(self, split: str) -> int:
        """test/predict splits carry prediction_horizon frames so the
        autoregressive rollout has targets (the datamodule convention of the
        physical benchmarks, ref ``get_horizon``)."""
        if split in ("test", "predict"):
            return self.prediction_horizon or self.horizon
        return self.horizon

    def setup(self, stage: Optional[str] = None) -> None:
        if self._splits:
            return
        trajs = make_synthetic_trajectories(
            self.n_traj, self.n_time, self.spatial, self.channels, self.seed
        )
        H, W = self.spatial
        rng = np.random.default_rng(self.seed + 1)
        n_tr = max(1, int(0.6 * self.n_traj))
        n_val = max(1, int(0.2 * self.n_traj))
        split_trajs = {
            "train": trajs[:n_tr],
            "val": trajs[n_tr : n_tr + n_val],
            "test": trajs[n_tr + n_val :] if n_tr + n_val < self.n_traj else trajs[-1:],
        }
        for name, tr in split_trajs.items():
            tensors = build_examples(tr, self.window, self.get_horizon(name))
            if self.conditional_channels > 0:
                cond = rng.normal(size=(1, H, W, self.conditional_channels)).astype(np.float32)
                tensors["condition"] = np.repeat(cond, tensors["dynamics"].shape[0], axis=0)
            self._splits[name] = DatasetSplit(tensors)
        self._splits["predict"] = self._splits["test"]
