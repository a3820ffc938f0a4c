"""Weight loader tests (reference M2; SURVEY.md section 2.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.models import yolov2_tiny
from dnn_inference_engine_tpu.models.weights import (
    fold_bn, load_checkpoint, load_darknet_weights, load_params, save_checkpoint,
    save_params,
)
from dnn_inference_engine_tpu.ops.conv import conv2d_fp32


def test_pickle_roundtrip(tmp_path, rng):
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "w.pkl")
    save_params(params, path)
    loaded = load_params(path)
    for p, q in zip(params, loaded):
        assert set(p.keys()) == set(q.keys())
        for k in p:
            np.testing.assert_array_equal(np.asarray(p[k]), q[k])


def test_bn_fold_math(rng):
    """conv+BN == conv with folded (w', b')."""
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    beta = rng.standard_normal(6).astype(np.float32)
    gamma = rng.uniform(0.5, 2, 6).astype(np.float32)
    mean = rng.standard_normal(6).astype(np.float32)
    var = rng.uniform(0.5, 2, 6).astype(np.float32)
    eps = 1e-6

    raw = np.asarray(conv2d_fp32(jnp.asarray(x), jnp.asarray(w),
                                 jnp.zeros(6), act="linear"))
    bn = gamma * (raw - mean) / np.sqrt(var + eps) + beta

    wf, bf = fold_bn(w, beta, gamma, mean, var, eps)
    folded = np.asarray(conv2d_fp32(jnp.asarray(x), jnp.asarray(wf),
                                    jnp.asarray(bf), act="linear"))
    np.testing.assert_allclose(folded, bn, rtol=1e-4, atol=1e-5)


def test_pickle_bn_layers_folded(tmp_path, rng):
    import pickle
    w = rng.standard_normal((3, 3, 3, 16)).astype(np.float32)
    raw = [{"w": w, "b": np.zeros(16, np.float32),
            "gamma": np.ones(16, np.float32),
            "mean": np.zeros(16, np.float32),
            "var": np.ones(16, np.float32)}]
    path = str(tmp_path / "bn.pkl")
    with open(path, "wb") as f:
        pickle.dump(raw, f)
    loaded = load_params(path)
    assert set(loaded[0].keys()) == {"w", "b"}
    # identity BN (gamma=1, mean=0, var=1, eps tiny) ~ unchanged weights
    np.testing.assert_allclose(loaded[0]["w"], w, rtol=1e-5)


def test_darknet_format_roundtrip(tmp_path, rng):
    """Write a synthetic darknet .weights file and parse it back."""
    model = yolov2_tiny()
    path = str(tmp_path / "synthetic.weights")
    chans = model.out_channels()
    blobs = [np.asarray([0, 2, 0], np.int32).tobytes(),
             np.asarray([0], np.int64).tobytes()]
    prev = 3
    expected = []
    from dnn_inference_engine_tpu.models.layers import Conv
    for li, layer in enumerate(model.layers):
        if isinstance(layer, Conv):
            c, k = layer.out_ch, layer.ksize
            w_oihw = rng.standard_normal((c, prev, k, k)).astype(np.float32)
            if layer.use_bn:
                beta = rng.standard_normal(c).astype(np.float32)
                gamma = rng.uniform(0.5, 2, c).astype(np.float32)
                mean = rng.standard_normal(c).astype(np.float32)
                var = rng.uniform(0.5, 2, c).astype(np.float32)
                blobs += [beta.tobytes(), gamma.tobytes(), mean.tobytes(),
                          var.tobytes(), w_oihw.tobytes()]
                wf, bf = fold_bn(w_oihw.transpose(2, 3, 1, 0), beta, gamma,
                                 mean, var)
                expected.append((wf, bf))
            else:
                bias = rng.standard_normal(c).astype(np.float32)
                blobs += [bias.tobytes(), w_oihw.tobytes()]
                expected.append((w_oihw.transpose(2, 3, 1, 0), bias))
        prev = chans[li]
    with open(path, "wb") as f:
        f.write(b"".join(blobs))

    params = load_darknet_weights(model, path)
    convs = [p for p in params if p]
    assert len(convs) == len(expected)
    for p, (we, be) in zip(convs, expected):
        np.testing.assert_allclose(p["w"], we, rtol=1e-6)
        np.testing.assert_allclose(p["b"], be, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path, rng):
    from dnn_inference_engine_tpu.quant.quantize import quantize_model_params
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    qparams = quantize_model_params(params, model.layers)
    scales = [0.1 * (i + 1) for i in range(len(model.layers) + 1)]
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, qparams, scales)
    loaded, loaded_scales = load_checkpoint(path)
    np.testing.assert_allclose(loaded_scales, scales, rtol=1e-6)
    for p, q in zip(qparams, loaded):
        assert set(p.keys()) == set(q.keys())
        for k in p:
            np.testing.assert_array_equal(np.asarray(p[k]), q[k])
            assert np.asarray(p[k]).dtype == q[k].dtype
