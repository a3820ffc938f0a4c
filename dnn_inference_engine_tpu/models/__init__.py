from dnn_inference_engine_tpu.models.layers import (  # noqa: F401
    Conv, MaxPool, Route, Shortcut, Upsample, GlobalAvgPool, Dense,
)
from dnn_inference_engine_tpu.models.model import Model  # noqa: F401
from dnn_inference_engine_tpu.models.yolov2_tiny import yolov2_tiny  # noqa: F401


def build_model(name: str, num_classes: int | None = None):
    """Model registry (reference picks models by CLI arg; SURVEY.md P5)."""
    from dnn_inference_engine_tpu.models.yolov2_tiny import yolov2_tiny
    from dnn_inference_engine_tpu.models.yolov3_tiny import yolov3_tiny
    from dnn_inference_engine_tpu.models.resnet18 import resnet18
    registry = {
        "yolov2-tiny": yolov2_tiny,
        "yolov3-tiny": yolov3_tiny,
        "resnet18": resnet18,
    }
    if name not in registry:
        raise ValueError(f"unknown model {name!r}; have {sorted(registry)}")
    if num_classes is None:
        return registry[name]()
    return registry[name](num_classes=num_classes)
