from dyffusion_tpu.experiments.base import Experiment, ExperimentConfig, stack_window  # noqa: F401
from dyffusion_tpu.experiments.interpolation import InterpolationExperiment  # noqa: F401
from dyffusion_tpu.experiments.forecasting import (  # noqa: F401
    DyffusionForecastingExperiment,
    SimultaneousForecastingExperiment,
    TimeConditionedForecastingExperiment,
)
