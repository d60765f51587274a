from dyffusion_tpu.training.ema import ema_update, init_ema  # noqa: F401
from dyffusion_tpu.training.optim import build_optimizer, make_lr_schedule  # noqa: F401
from dyffusion_tpu.training.state import TrainState  # noqa: F401
