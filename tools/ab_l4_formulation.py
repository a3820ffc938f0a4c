"""Whole-net A/B: conv3 (L4) formulation, in context.

Round-4 xplane attribution (docs/TRACE_ATTRIB_r04.json) shows the
L2->L4 seam costing ~560 us beyond the conv itself: the group-max
fusion (235 us), a {1,3,2,0} relayout copy (146 us) and the
shift_s2d2_pallas input chain (96+35+44 us). Hypothesis: the Pallas
boundary forces layouts on XLA's int8 conv chain (isolated, the same
conv+epilogue+gmax runs in 141 us — tools/ab_l2_rs.py). This A/B
measures, whole-net and interleaved:

  k2+shift-kernel   current production (USE_SHIFT_S2D2_KERNEL=True)
  k2+xla-s2d        same weights, XLA pad+space_to_depth chain
  k3+plain-s2d      fold_xla: 3x3 folded conv over plain s2d(2) —
                    NO pallas between the stem and conv7

Run on chip: python tools/ab_l4_formulation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import dnn_inference_engine_tpu.runtime.plan as plan_mod
from dnn_inference_engine_tpu.runtime.plan import _YOLOV2_STRATEGY
from dnn_inference_engine_tpu.runtime.plan_sweep import _SweepContext


def main():
    ctx = _SweepContext("yolov2-tiny", "w8a8", 32, None)
    base = dict(_YOLOV2_STRATEGY)

    variants = [
        ("k2+shift-kernel (prod)", dict(base), True),
        ("k2+xla-s2d", dict(base), False),
        ("k3+plain-s2d", {**base, 4: ("fold_xla", 2)}, True),
    ]
    # one measure call per variant (each ctx.measure re-jits: through the
    # relay a whole-net compile is ~40 s, so looping reps over variants
    # would spend 20+ min recompiling); reps=5 inside per_iter_time give
    # the interleaved lo/hi spread
    for name, strat, use_kernel in variants:
        plan_mod.USE_SHIFT_S2D2_KERNEL = use_kernel
        t, rms, err = ctx.measure(strat, iters=(60, 10), reps=5)
        plan_mod.USE_SHIFT_S2D2_KERNEL = True
        if t is None:
            print(f"{name:24s} FAILED: {err}", flush=True)
        else:
            print(f"{name:24s} min {t*1e3:.3f} ms  "
                  f"({32 / t:.0f} img/s, rms {rms:.4f})", flush=True)


if __name__ == "__main__":
    main()
