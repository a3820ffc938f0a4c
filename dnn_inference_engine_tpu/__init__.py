"""TPU-native quantized CNN inference engine.

A brand-new JAX/XLA/Pallas framework replicating the capability set of the
reference coursework engine ``tink-expo/dnn-inference-engine`` (see SURVEY.md;
the reference mount was empty at survey time, so reference citations are to
SURVEY.md sections rather than file:line):

- YOLOv2-tiny-class CNNs executed layer-by-layer (SURVEY.md section 2.5)
- INT8 weight-only (per-output-channel scales) and full W8A8 modes
  (SURVEY.md section 2.2, Q1-Q3)
- The reference's AVX/CUDA/cuBLAS im2col-GEMM kernels (SURVEY.md K1-K7)
  become Pallas MXU kernels fusing dequant + matmul + bias + leaky-ReLU
- Maxpool and NMS-ready head decode stay on-device (SURVEY.md K8, P2-P3)
- Multi-chip scaling via jax.sharding Mesh: batch-sharded activations,
  replicated or channel-sharded conv weights (SURVEY.md section 2.6)
- Continuous-batching serving loop (SURVEY.md N1)
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (measured 16x faster warm starts;
    whole-model compiles through the axon relay take minutes cold).

    Opt out with DIE_TPU_NO_COMPILE_CACHE=1 or point elsewhere with
    DIE_TPU_COMPILE_CACHE_DIR. Applied lazily via jax.config so importing
    this package never initializes a backend. User-set configuration wins:
    if the cache dir is already configured (via JAX_COMPILATION_CACHE_DIR
    or an earlier jax.config call), nothing is touched.
    """
    if _os.environ.get("DIE_TPU_NO_COMPILE_CACHE") == "1":
        return
    import jax
    if (_os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or jax.config.jax_compilation_cache_dir):
        return     # respect existing user configuration
    repo_cache = _os.path.join(
        _os.path.dirname(_os.path.dirname(__file__)), ".jax_cache")
    cache_dir = _os.environ.get("DIE_TPU_COMPILE_CACHE_DIR") or (
        # keep a pre-existing source-tree cache warm (dev checkouts);
        # never CREATE one there — installed packages get ~/.cache
        repo_cache if _os.path.isdir(repo_cache)
        else _os.path.join(_os.path.expanduser("~"), ".cache",
                           "dnn_inference_engine_tpu", "jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if jax.config.jax_persistent_cache_min_compile_time_secs == 1.0:
        # 1.0 is jax's default; only lower it if the user hasn't changed it
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_enable_compilation_cache()

from dnn_inference_engine_tpu.config import EngineConfig  # noqa: F401
