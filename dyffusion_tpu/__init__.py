"""dyffusion_tpu — a TPU-native JAX/XLA/Pallas framework for dynamics-informed
diffusion forecasting, with the capabilities of Rose-STL-Lab/dyffusion.

Layout convention: all spatial tensors are NHWC (batch, height, width, channel)
— the TPU-native convolution layout — and trajectory tensors are
(batch, time, height, width, channel). The PyTorch reference uses NCHW /
(b, t, c, h, w); every channel-stacking operation here acts on the LAST axis.
"""

__version__ = "0.1.0"
