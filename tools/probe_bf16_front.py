"""GO/NO-GO probe: would a bf16 front end beat the int8 one?

The w8a8 front end (stem + conv2 + conv3 folds) is 73% of the b32
module at 12-24% of its binding roofline — a measured toolchain floor
for the INT8 path (docs/FRONTEND_FLOORS.md: XLA's int8 conv emitter
layout cliffs + Mosaic int8-max limits). The bf16 conv emitter has
none of those cliffs, and the front end is nowhere near MXU-bound, so
bf16's half-rate MXU may not matter. This probe times, same-process:

  A. the production int8 front (w8a8 plan stages 0..2, exactly as the
     engine runs them, via _run_stage on recorded stage inputs);
  B. a bf16 front with the same fold structure (u8/255 -> shifted
     fold-4 k2 conv -> gmax -> fold-2 conv -> gmax -> shifted k2
     fold-2 conv -> gmax, conv_bf16-style from plan_forward_w8),
     requantized to the SAME int8 state at the end.

If B wins materially, a mixed-precision plan kind is the round-5+
follow-up; if not, this file is the negative record.

Run: python tools/probe_bf16_front.py [batch]
"""

import sys

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import jax
    import jax.numpy as jnp
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.quant.quantize import quantize_act
    from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time_stats
    from dnn_inference_engine_tpu.runtime.engine import Engine
    from dnn_inference_engine_tpu.runtime.plan import (
        _run_stage, depth_to_space, plan_forward_w8a8, space_to_depth)

    eng = Engine(EngineConfig(mode="w8a8", kernel="auto", batch=batch)
                 ).load_weights(key=jax.random.PRNGKey(0)).prepare()
    plan, pps = eng._plan, eng._plan_params
    scales = eng.act_scales
    layers = eng.model.layers
    n_front = 3                      # stages 0..2: stem, conv2, conv3
    rng = np.random.default_rng(0)
    x_u8 = jnp.asarray(rng.integers(0, 256, (batch, 416, 416, 3)),
                       jnp.uint8)

    states = []
    plan_forward_w8a8(eng.model, plan, pps, scales, x_u8,
                      record_states=states)

    def int8_front(xx):
        cs, cf = states[0][1], states[0][2]
        saved = dict(states[0][3])
        for si in range(n_front):
            xx, cs, cf = _run_stage(layers, plan[si], pps[si], xx, cs, cf,
                                    scales, saved)
        return xx

    def bf16_front(xx):
        x = xx.astype(jnp.float32) / 255.0
        cur_fold = 1
        for si in range(n_front):
            st, pp = plan[si], pps[si]
            f = st.fold
            act = st.act
            w = pp["wq"].astype(jnp.bfloat16)
            cout = pp["s_w"].shape[0] // (f * f)

            def conv(xb, valid_k2=False):
                y = jax.lax.conv_general_dilated(
                    xb.astype(jnp.bfloat16), w, (1, 1),
                    "VALID" if valid_k2 else "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                y = y * pp["s_w"] + pp["b"]
                return jnp.where(y > 0, y, 0.1 * y) if act == "leaky" else y

            if st.kind in ("stem_rs", "stem_dg", "fold_xla_k2"):
                if cur_fold > 1:
                    x = depth_to_space(x, cur_fold)
                x = jnp.pad(x, ((0, 0), (1, 2 * f - 1), (1, 2 * f - 1),
                                (0, 0)))
                x = space_to_depth(x, f)
                if st.cin_pad and x.shape[-1] < st.cin_pad:
                    x = jnp.pad(x, ((0, 0),) * 3
                                + ((0, st.cin_pad - x.shape[-1]),))
                ho, wo = x.shape[1] - 2, x.shape[2] - 2
                y = conv(x, valid_k2=True)[:, :ho, :wo]
            elif st.kind == "fold_xla":
                if cur_fold != f:
                    if cur_fold > 1:
                        x = depth_to_space(x, cur_fold)
                    x = space_to_depth(x, f)
                y = conv(x)
            else:
                raise ValueError(st.kind)
            go = (f // 2) ** 2 * cout
            yb = y.astype(jnp.bfloat16)
            x = jnp.maximum(jnp.maximum(yb[..., :go], yb[..., go:2 * go]),
                            jnp.maximum(yb[..., 2 * go:3 * go],
                                        yb[..., 3 * go:]))
            cur_fold = f // 2
        # land in the SAME int8 state the int8 front ends in
        li_next = plan[n_front - 1].conv_li + 1
        return quantize_act(x.astype(jnp.float32),
                            jnp.float32(scales[li_next]))

    a = int8_front(x_u8)
    b = bf16_front(x_u8)
    da = np.asarray(depth_to_space(a, 1) if a.dtype == jnp.int8 else a,
                    np.float32)
    db = np.asarray(b, np.float32)
    assert da.shape == db.shape, (da.shape, db.shape)
    rel = float(np.linalg.norm(da - db) / max(np.linalg.norm(da), 1e-9))
    print(f"b{batch} int8-vs-bf16 front rel RMS (int8 codes): {rel:.4f}",
          flush=True)

    for name, fn in (("int8_front", int8_front), ("bf16_front", bf16_front)):
        s = per_iter_time_stats(fn, (x_u8,))
        print(f"b{batch} {name}: {s['min']*1e3:.4f} ms "
              f"(noise {s['spread_pct']:.0f}%, iters {s['iters']})",
              flush=True)


if __name__ == "__main__":
    main()
