"""Engine: compile-once inference runtime (reference L5 driver + E2 timing,
SURVEY.md sections 2.4 P5, 2.8, 3.5).

Unlike the reference's per-layer Python loop with host round-trips
(SURVEY.md 3.2), the whole pipeline — quantize input, all conv layers,
head decode, NMS — is one jitted XLA program; the device boundary is
crossed exactly twice per batch (input in, boxes out).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.config import EngineConfig, YOLOV2_TINY_ANCHORS, YOLOV3_TINY_ANCHORS
from dnn_inference_engine_tpu.models import build_model
from dnn_inference_engine_tpu.models.weights import (
    load_checkpoint, load_darknet_weights, load_params, save_checkpoint,
)
from dnn_inference_engine_tpu.postprocess import (
    decode_yolov2, decode_yolov3, device_nms,
)
from dnn_inference_engine_tpu.quant.quantize import (
    calibrate, quantize_model_params,
)


class Engine:
    """Compiled inference engine for one model/mode/batch configuration."""

    def __init__(self, config: EngineConfig):
        self.config = config
        self.model = build_model(config.model, num_classes=config.num_classes)
        self.params: Optional[List[Dict]] = None       # mode-matching params
        self.fp32_params: Optional[List[Dict]] = None  # kept for calibration
        self.act_scales: Optional[List[float]] = None
        self._detect_fn = None
        self._forward_fn = None
        self._plan = None             # fused stage plan (runtime/plan.py)
        self._plan_params = None
        self._mesh = None             # built lazily from config.mesh_shape

    @property
    def mesh(self):
        """(data, model) device mesh when config.mesh_shape spans more
        than one device; None for single-device configs (SURVEY.md N2)."""
        dp, mp = self.config.mesh_shape
        if dp * mp <= 1:
            return None
        if self._mesh is None:
            from dnn_inference_engine_tpu.parallel.mesh import make_mesh
            self._mesh = make_mesh(self.config.mesh_shape)
        return self._mesh

    # ------------------------------------------------------------------
    # Weights
    # ------------------------------------------------------------------

    def load_weights(self, path: Optional[str] = None,
                     key: Optional[jax.Array] = None) -> "Engine":
        """Load from .npz checkpoint / .pkl pytree / darknet .weights, or
        initialize randomly (synthetic-weight mode when no file exists)."""
        path = path or self.config.weights
        self._weights_from_file = path is not None
        if path is None:
            self.fp32_params = self.model.init_params(
                key if key is not None else jax.random.PRNGKey(0))
        elif path.endswith(".npz"):
            params, scales = load_checkpoint(path)
            if scales is not None:
                self.act_scales = scales
            if any("wq" in p for p in params):
                self.params = params      # already quantized
                return self
            self.fp32_params = params
        elif path.endswith(".weights"):
            self.fp32_params = load_darknet_weights(self.model, path)
        else:
            self.fp32_params = load_params(path)
        return self

    def prepare(self, calib_images: Optional[np.ndarray] = None) -> "Engine":
        """Quantize (Q1) + calibrate (Q2) as the mode requires."""
        mode = self.config.mode
        if mode == "fp32":
            self.params = self.fp32_params
            return self
        if self.params is None:
            assert self.fp32_params is not None, "load_weights first"
            self.params = quantize_model_params(self.fp32_params,
                                                self.model.layers)
        if mode in ("w8a8", "w8") and self.config.kernel == "auto":
            from dnn_inference_engine_tpu.runtime.plan import (
                build_plan, prepare_plan_params)
            strategy = None
            if self.config.strategy:
                # measured strategy artifact (runtime/plan_sweep.py)
                from dnn_inference_engine_tpu.runtime.plan_sweep import (
                    load_strategy)
                strategy = load_strategy(self.config.strategy)
            self._plan = build_plan(self.model, strategy,
                                    batch=self.config.batch, mode=mode)
            if (mode == "w8" and self._plan is not None
                    and any(st.kind in ("rs", "s0") for st in self._plan)):
                self._plan = None       # int8-kernel kinds: no w8 variant
            if self._plan is not None:
                self._plan_params = prepare_plan_params(
                    self.model, self.params, self._plan)
        if mode == "w8a8" and self.act_scales is None:
            if calib_images is None and self.config.calib:
                # config-driven calibration (Q2): a directory of images
                # or a pre-built .npy/.npz batch — same loader as the
                # CLI's --calib-images, so the error below's remediation
                # ("set config.calib") actually works.
                from dnn_inference_engine_tpu.preprocess import (
                    load_calib_images)
                calib_images = load_calib_images(
                    self.config.calib, self.config.input_size)
            if calib_images is None:
                # fallback: uniform-noise calibration. Fine for synthetic
                # weights; an accuracy footgun for real ones — scales from
                # noise can be arbitrarily wrong for natural images.
                if getattr(self, "_weights_from_file", False):
                    raise ValueError(
                        "w8a8 with file-loaded weights needs real "
                        "calibration images: pass calib_images to "
                        "prepare(), load a checkpoint with saved scales, "
                        "or set config.calib. (Uniform-noise fallback is "
                        "only allowed for randomly initialized weights.)")
                import warnings
                warnings.warn(
                    "w8a8 calibration falling back to uniform noise "
                    "(synthetic-weights mode); activation scales will not "
                    "match natural images", stacklevel=2)
                calib_images = np.random.default_rng(0).uniform(
                    0, 1, (8, self.config.input_size,
                           self.config.input_size, 3)).astype(np.float32)
            assert self.fp32_params is not None, (
                "w8a8 calibration needs fp32 params")
            self.act_scales = calibrate(self.model, self.fp32_params,
                                        calib_images)
        if self.mesh is not None:
            # place every exec param leaf with its NamedSharding so the
            # sharded programs (parallel/sharded_engine.py) consume them
            # without resharding transfers
            from dnn_inference_engine_tpu.parallel.sharded_engine import (
                shard_engine_params)
            shard_engine_params(self, self.mesh)
        return self

    def save(self, path: str) -> None:
        save_checkpoint(path, self.params, self.act_scales)

    # ------------------------------------------------------------------
    # Compiled functions
    # ------------------------------------------------------------------

    @property
    def exec_params(self):
        """Params pytree the compiled functions take (plan params when a
        fused plan is active) — passed as jit arguments, not baked
        constants."""
        return self._plan_params if self._plan is not None else self.params

    def _fwd(self, params, x):
        if x.dtype == jnp.uint8:
            # serving path ships uint8 over the host->device link (4x less
            # transfer than f32 — dominant in relay/tunnel deployments).
            # The fused w8a8 plan's input stage normalizes IN-KERNEL (no
            # f32 materialization of the batch at all); other paths
            # normalize on device here.
            from dnn_inference_engine_tpu.runtime.plan import (
                plan_input_uint8_ok)
            if not (self._plan is not None and self.config.mode == "w8a8"
                    and plan_input_uint8_ok(self._plan)):
                x = x.astype(jnp.float32) / 255.0
        if self._plan is not None:
            from dnn_inference_engine_tpu.runtime.plan import (
                plan_forward_w8, plan_forward_w8a8)
            if self.config.mode == "w8":
                return plan_forward_w8(self.model, self._plan, params, x)
            return plan_forward_w8a8(self.model, self._plan, params,
                                     self.act_scales, x)
        return self.model.forward(params, x, mode=self.config.mode,
                                  act_scales=self.act_scales,
                                  kernel=self.config.kernel)

    def forward_fn(self):
        if self._forward_fn is None:
            if self.mesh is not None:
                from dnn_inference_engine_tpu.parallel.sharded_engine import (
                    make_sharded_forward_fn)
                self._forward_fn = make_sharded_forward_fn(self, self.mesh)
            else:
                self._forward_fn = jax.jit(self._fwd)
        return self._forward_fn

    def _decode(self, heads):
        c = self.config
        if self.model.name == "yolov2-tiny":
            return decode_yolov2(heads, YOLOV2_TINY_ANCHORS,
                                 c.num_classes, c.input_size)
        if self.model.name == "yolov3-tiny":
            h1, h2 = heads
            b1, s1 = decode_yolov3(h1, YOLOV3_TINY_ANCHORS[3:],
                                   c.num_classes, c.input_size)
            b2, s2 = decode_yolov3(h2, YOLOV3_TINY_ANCHORS[:3],
                                   c.num_classes, c.input_size)
            return (jnp.concatenate([b1, b2], axis=1),
                    jnp.concatenate([s1, s2], axis=1))
        raise ValueError(f"{self.model.name} is not a detector")

    def postprocess(self, heads):
        """heads -> (boxes xyxy (B,D,4), scores (B,D), classes (B,D)),
        all in-graph. Uses the COLUMNAR decode+NMS layout internally
        ((B,4,M)/(B,C,M) — the big M dim stays in the TPU lanes; the
        round-5 trace showed the row-major layout padding boxes 32x and
        scores 6.4x). Semantically identical to decode_* + device_nms
        up to tie-break order (anchor-major candidate order)."""
        from dnn_inference_engine_tpu.postprocess import (
            decode_yolov2_cols, decode_yolov3_cols, device_nms_cols)
        c = self.config
        if self.model.name == "yolov2-tiny":
            boxes, scores = decode_yolov2_cols(
                heads, YOLOV2_TINY_ANCHORS, c.num_classes, c.input_size)
        elif self.model.name == "yolov3-tiny":
            h1, h2 = heads
            b1, s1 = decode_yolov3_cols(h1, YOLOV3_TINY_ANCHORS[3:],
                                        c.num_classes, c.input_size)
            b2, s2 = decode_yolov3_cols(h2, YOLOV3_TINY_ANCHORS[:3],
                                        c.num_classes, c.input_size)
            boxes = jnp.concatenate([b1, b2], axis=-1)
            scores = jnp.concatenate([s1, s2], axis=-1)
        else:
            raise ValueError(f"{self.model.name} is not a detector")
        return device_nms_cols(boxes, scores,
                               iou_thresh=c.nms_iou_thresh,
                               score_thresh=c.score_thresh,
                               topk=c.resolved_nms_topk(),
                               max_det=c.max_detections)

    def detect_fn(self):
        """image batch -> (boxes xyxy, scores, classes), all on device.

        With a mesh configured the returned function is one jitted
        shard_map program over the whole pipeline (forward + decode +
        NMS), batch-sharded over 'data' with the channel pair's int32
        psum over 'model' (SURVEY.md 3.5 / BASELINE config 5)."""
        if self._detect_fn is None:
            if self.mesh is not None:
                from dnn_inference_engine_tpu.parallel.sharded_engine import (
                    make_sharded_detect_fn)
                self._detect_fn = make_sharded_detect_fn(self, self.mesh)
                return self._detect_fn
            c = self.config

            def run(params, x):
                heads = self._fwd(params, x)
                return self.postprocess(heads)
            self._detect_fn = jax.jit(run)
        return self._detect_fn

    def _device_batch(self, images: np.ndarray) -> jnp.ndarray:
        """asarray + (when sharded) batch-shard placement over 'data'."""
        x = jnp.asarray(images)
        if self.mesh is not None:
            from dnn_inference_engine_tpu.parallel.sharding import (
                input_sharding)
            dp = self.config.mesh_shape[0]
            if x.shape[0] % dp:
                raise ValueError(
                    f"batch {x.shape[0]} not divisible by the data-axis "
                    f"size {dp}; pad the batch (the serving loop does)")
            x = jax.device_put(x, input_sharding(self.mesh))
        return x

    def detect_device(self, images: np.ndarray):
        """Dispatch the detect program WITHOUT host synchronization:
        returns device arrays (boxes, scores, classes). JAX dispatch is
        async, so the caller can overlap host work (e.g. assembling the
        next serving batch) with device execution and only pay the
        device->host sync when it np.asarray's the results."""
        return self.detect_fn()(self.exec_params,
                                self._device_batch(images))

    def detect(self, images: np.ndarray):
        """Preprocessed image batch (N,S,S,3) f32 -> host numpy results."""
        b, s, cl = self.detect_device(images)
        return np.asarray(b), np.asarray(s), np.asarray(cl)

    def classify(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(
            self.forward_fn()(self.exec_params, self._device_batch(images)))

    # ------------------------------------------------------------------
    # Timing (reference E2 per-layer report)
    # ------------------------------------------------------------------

    def _bench_input(self, batch: int) -> jnp.ndarray:
        """Deterministic bench batch in the format production executes:
        uint8 serving wire format when the plan ingests it in-kernel
        (bench.py/serve ship uint8), f32 otherwise."""
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (batch, self.config.input_size, self.config.input_size, 3)
        ).astype(np.float32))
        from dnn_inference_engine_tpu.runtime.plan import plan_input_uint8_ok
        if self._plan is not None and plan_input_uint8_ok(self._plan):
            x = jnp.asarray(np.clip(np.round(np.asarray(x) * 255), 0, 255),
                            jnp.uint8)
        return x

    def stage_times_traced(self, batch: Optional[int] = None,
                           runs: int = 30) -> Dict:
        """Stage roofline rows MERGED with in-context xplane trace time.

        Round-4 verdict weak #2: ``stage_times`` (isolated
        loop-difference timing per stage) and the xplane trace
        (in-context module time) disagreed by ~35% — boundary/relayout
        cost that only exists in context (e.g. the conv2 seam: 598 us
        in-context vs 141 us isolated, docs/FRONTEND_FLOORS.md) lived
        in neither artifact's rows. This report carries BOTH views per
        stage so they reconcile in data, not prose:

        - ``ms``: the isolated loop-difference time (uncontended kernel
          speed, relay-immune by subtraction);
        - ``trace_ms``: in-context device time of the stage's named
          scope from the xplane trace (device-side timestamps). 0.0
          means XLA fused this stage into a neighbour — the neighbour's
          row carries the combined time (e.g. conv8 fuses into the
          conv9 stage at batch 32);
        - extra ``unattributed/*`` rows (relayout copies etc.) with
          only ``trace_ms``, so the trace column sums to the module
          device time (``module_ms``; reconciliation asserted to 2%).

        TPU-only (the trace needs a device plane).
        """
        batch = batch or self.config.batch
        rep = self.stage_times(batch=batch)
        from dnn_inference_engine_tpu.runtime.profiling import (
            trace_attribution)
        x = self._bench_input(batch)
        art = trace_attribution(jax.jit(self._fwd), self.exec_params, x,
                                runs=runs)
        scopes = dict(art["by_scope_us"])
        used = set()
        for row in rep:
            pref = f"stage{row['stage']}_"
            keys = [k for k in scopes if k.startswith(pref)]
            used.update(keys)
            row["trace_ms"] = round(sum(scopes[k] for k in keys) / 1e3, 4)
        extra = [{"stage": None, "name": k, "kind": "unattributed",
                  "ms": None, "trace_ms": round(v / 1e3, 4)}
                 for k, v in scopes.items() if k not in used]
        module_ms = art["module_device_us_per_run"] / 1e3
        trace_total = sum(r["trace_ms"] for r in rep + extra)
        assert abs(trace_total - module_ms) < 0.02 * max(module_ms, 1e-9), (
            f"trace rows ({trace_total:.3f} ms) do not sum to the module "
            f"device time ({module_ms:.3f} ms)")
        iso_total = sum(r["ms"] for r in rep)
        return {
            "batch": batch,
            "module_ms": round(module_ms, 4),
            "total_stage_ms": round(iso_total, 4),
            "trace_total_ms": round(trace_total, 4),
            "in_context_overhead_ms": round(module_ms - iso_total, 4),
            "runs_traced": art["runs_traced"],
            "stages": rep + extra,
        }

    def stage_times(self, batch: Optional[int] = None,
                    iters: Optional[Tuple[int, int]] = None) -> List[Dict]:
        """Per-stage timing + roofline report for the EXECUTED pipeline.

        Unlike layer_times (which times the generic per-tier conv ops in
        isolation), this times the actual plan stages — folds, fused
        kernels, group-max pooling — each on its real in-pipeline input
        state. Per stage: {name, kind, ms, gop (useful work), gop_exec
        (MACs the MXU performs under the stage's formulation), mfu_pct
        (useful-work fraction of int8 peak), hw_util_pct (executed-MAC
        fraction — how close the kernel itself runs to the hardware),
        hbm_mb (minimal contract traffic: input + params + output),
        binding ("mxu"|"hbm": which roofline floor binds),
        pct_of_binding (fraction of the binding roofline — auditable
        against 100% for every stage, incl. bandwidth-bound ones),
        noise_pct (rep-to-rep spread of the loop-difference), suspect
        (True when the numbers cannot be trusted: utilization above
        chip peak, or <20 ms of device work resolved)}.

        By default iteration counts AUTO-SCALE per stage so the timed
        loop-count difference is ~120 ms of device work — fixed counts
        under-measure sub-200 us stages through the relay (a 32-iter
        difference of a 130 us stage is ~4 ms, inside RTT noise, and
        produced >100% "MFU" artifacts in round 2). Pass explicit
        ``iters=(hi, lo)`` only for quick smoke timing.

        SURVEY.md N4: this is the per-layer roofline % artifact for the
        >=95%-of-roofline north star.
        """
        from dnn_inference_engine_tpu.runtime.benchlib import (
            V5E_INT8_TOPS, binding_bound_s, per_iter_time_stats,
            roofline_pct)
        from dnn_inference_engine_tpu.runtime.plan import (
            _run_stage, plan_forward_w8a8, stage_flops)
        assert self._plan is not None and self.config.mode == "w8a8", (
            "stage_times needs the fused w8a8 plan (mode=w8a8, "
            "kernel=auto); use layer_times for other configs")
        batch = batch or self.config.batch
        x = self._bench_input(batch)
        # eager pass capturing each stage's true input state
        states: List = []
        plan_forward_w8a8(self.model, self._plan, self._plan_params,
                          self.act_scales, x, record_states=states)
        flops = stage_flops(self.model, self._plan,
                            input_size=self.config.input_size)
        layers = self.model.layers
        report: List[Dict] = []
        for si, st in enumerate(self._plan):
            x0, cs0, cf0, saved0 = states[si]
            pp = self._plan_params[si]

            def f(xx, _st=st, _pp=pp, _cs=cs0, _cf=cf0, _sv=saved0):
                return _run_stage(layers, _st, _pp, xx, _cs, _cf,
                                  self.act_scales, _sv)[0]
            # minimal HBM traffic of this stage's CONTRACT: input +
            # params + output bytes. (A formulation may move more —
            # folded intermediates, relayouts — which correctly shows
            # up as a lower pct_of_binding, never a higher one.)
            if si + 1 < len(states):
                x_out = states[si + 1][0]
            else:
                x_out = f(x0)
            hbm_bytes = (x0.size * x0.dtype.itemsize
                         + x_out.size * x_out.dtype.itemsize
                         + sum(int(v.size) * v.dtype.itemsize
                               for v in pp.values()))
            if iters is not None:
                s = per_iter_time_stats(f, (x0,), iters_hi=iters[0],
                                        iters_lo=iters[1])
            else:
                s = per_iter_time_stats(f, (x0,))   # auto-scaled counts
            t = max(s["min"], 1e-9)  # min-of-reps: uncontended kernel speed
            useful, executed = flops[si]
            gop = 2 * useful * batch / 1e9          # MACs -> ops
            gop_exec = 2 * executed * batch / 1e9
            # resolution floor: if the loop difference resolved <20 ms of
            # device work (stage faster than the auto-scaler's max_iters
            # can stretch, or fixed iters passed), utilization ratios are
            # unreliable — mark them rather than reporting absurd numbers.
            sub_res = s["delta_work_s"] < 0.02
            mfu = round(roofline_pct(gop * 1e9, t, V5E_INT8_TOPS), 2)
            hw = round(roofline_pct(gop_exec * 1e9, t, V5E_INT8_TOPS), 2)
            # binding roofline: MXU floor for the formulation's executed
            # ops vs HBM floor for its minimal traffic — whichever binds
            bound_s, binding = binding_bound_s(gop_exec * 1e9, hbm_bytes)
            pct_binding = round(100.0 * bound_s / t, 2)
            report.append({
                "stage": si,
                "name": f"L{st.conv_li}_{st.kind}"
                        + (f"_f{st.fold}" if st.fold > 1 else ""),
                "kind": st.kind,
                "ms": round(t * 1e3, 4),
                "gop": round(gop, 3),
                "gop_exec": round(gop_exec, 3),
                "mfu_pct": None if sub_res else mfu,
                "hw_util_pct": None if sub_res else hw,
                "hbm_mb": round(hbm_bytes / 1e6, 2),
                "binding": binding,
                "pct_of_binding": None if sub_res else pct_binding,
                "noise_pct": round(min(s["spread_pct"], 999.9), 1),
                "iters": list(s["iters"]),
                "sub_resolution": sub_res,
                # physically impossible (>peak) utilization = the timing
                # is wrong, not the kernel fast; flag loudly
                "suspect": bool(sub_res or mfu > 100.0 or hw > 105.0),
            })
        return report

    def layer_times(self, batch: Optional[int] = None,
                    iters: Tuple[int, int] = (60, 10)) -> List[Tuple[str, float]]:
        """Steady-state per-layer seconds (separate jits, honest timing)."""
        from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time
        from dnn_inference_engine_tpu.models.layers import Conv
        batch = batch or self.config.batch
        report = []
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (batch, self.config.input_size, self.config.input_size, 3)
        ).astype(np.float32))
        # capture per-layer inputs at fp32 then time each conv op tier
        assert self.fp32_params is not None
        _, inputs = self.model.forward_fp32(self.fp32_params, x,
                                            capture_inputs=True)
        for li, layer in enumerate(self.model.layers):
            if not isinstance(layer, Conv):
                continue
            xin = inputs[li]
            p = self.params[li]
            # time the dispatched conv op directly
            from dnn_inference_engine_tpu.models.model import _get_conv_fn
            conv_fn = _get_conv_fn(
                "fp32" if self.config.mode == "fp32" else self.config.mode,
                self.config.kernel)
            if self.config.mode == "fp32":
                f = lambda xx: conv_fn(xx, p["w"], p["b"], act=layer.act,
                                       stride=layer.stride,
                                       padding=layer.padding)
            elif self.config.mode == "w8":
                f = lambda xx: conv_fn(xx, p["wq"], p["s_w"], p["b"],
                                       act=layer.act, stride=layer.stride,
                                       padding=layer.padding)
            else:
                s_in = jnp.float32(self.act_scales[li])
                from dnn_inference_engine_tpu.quant.quantize import quantize_act
                xin_q = quantize_act(xin, s_in)
                f = lambda xx: conv_fn(xx, s_in, p["wq"], p["s_w"], p["b"],
                                       act=layer.act, stride=layer.stride,
                                       padding=layer.padding)
                xin = xin_q
            t = per_iter_time(f, (xin,), iters_hi=iters[0], iters_lo=iters[1])
            report.append((f"layer{li} conv{layer.ksize}x{layer.ksize}"
                           f"->{layer.out_ch}", t))
        return report
