from dyffusion_tpu.ops.fused_act import fused_leaky_relu  # noqa: F401
from dyffusion_tpu.ops.upfirdn2d import (  # noqa: F401
    conv_downsample_2d,
    downsample_2d,
    setup_fir_kernel,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)
