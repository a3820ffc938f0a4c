from dnn_inference_engine_tpu.quant.quantize import (  # noqa: F401
    quantize_weights_per_channel,
    quantize_act,
    dequantize,
    calibrate,
    quantize_model_params,
)
