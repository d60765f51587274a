from dyffusion_tpu.models.base import (  # noqa: F401
    BackboneSpec,
    init_backbone,
    make_apply_fn,
    make_train_apply_fn,
)
from dyffusion_tpu.models.simple_conv_net import SimpleConvNet  # noqa: F401
from dyffusion_tpu.models.unet import Unet  # noqa: F401
from dyffusion_tpu.models.unet_simple import UNetSimple  # noqa: F401
