from dyffusion_tpu.utils.evaluation import (  # noqa: F401
    crps_ensemble,
    evaluate_ensemble_prediction,
    mse_ensemble,
    spread_skill_ratio,
)
from dyffusion_tpu.utils.loss import get_loss_fn  # noqa: F401
