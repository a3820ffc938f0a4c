from dnn_inference_engine_tpu.ops.activations import apply_activation, leaky_relu  # noqa: F401
from dnn_inference_engine_tpu.ops.pool import maxpool  # noqa: F401
from dnn_inference_engine_tpu.ops.conv import conv2d_fp32, conv2d_w8, conv2d_w8a8  # noqa: F401
