from dnn_inference_engine_tpu.parallel.mesh import make_mesh  # noqa: F401
from dnn_inference_engine_tpu.parallel.sharding import (  # noqa: F401
    shard_params, make_sharded_forward, input_sharding,
)
