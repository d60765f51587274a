from dyffusion_tpu.data.base import (  # noqa: F401
    DataModule,
    DatasetSplit,
    get_dims_of_dataset,
    sliding_window_multi_horizon,
)
from dyffusion_tpu.data.synthetic import SyntheticDataModule, make_synthetic_trajectories  # noqa: F401
