from dnn_inference_engine_tpu.eval.voc import voc_eval, voc_map  # noqa: F401
from dnn_inference_engine_tpu.eval.golden import (  # noqa: F401
    dump_goldens, compare_goldens, load_goldens,
)
