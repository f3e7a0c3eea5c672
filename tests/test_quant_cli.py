"""Tests for int8 quantization and the CLI surfaces."""
import json
import numpy as np
import jax
import jax.numpy as jnp

from posebyte_tpu.models import build_model, init_params
from posebyte_tpu.models.quant import (quantize_params, _quantize_conv,
                                       PARTIAL_QUANT_SKIP)


def test_quantize_conv_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.1, size=(3, 3, 8, 16)).astype(np.float32)
    p = {"w": w, "b": np.zeros(16, np.float32)}
    q = _quantize_conv(p)
    assert q["w"].dtype == np.int8
    deq = q["w"].astype(np.float32) * q["scale"]
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01   # int8 per-channel: < 1% of range


def test_partial_quant_policy():
    params = init_params(jax.random.PRNGKey(0), "yolov8n-pose")
    q = quantize_params(params)
    # stem stays float (reference keeps /model.0/../model.4/ FP16)
    for key in PARTIAL_QUANT_SKIP:
        for leaf in jax.tree.leaves(q[key]):
            assert leaf.dtype != jnp.int8
    # later layers quantized
    assert q["b9"]["cv1"]["w"].dtype == jnp.int8
    assert q["head"]["cv4"][0]["0"]["w"].dtype == jnp.int8


def test_quantized_forward_close_to_float():
    apply_fn, init_fn = build_model("yolov8n-pose")
    params = init_fn(jax.random.PRNGKey(0))
    q = quantize_params(params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    ref = jax.jit(apply_fn)(params, x)
    got = jax.jit(apply_fn)(q, x)
    assert got.shape == ref.shape
    # confidences (sigmoid outputs) stay close
    np.testing.assert_allclose(np.asarray(got[0, 4]),
                               np.asarray(ref[0, 4]), atol=0.1)


def test_export_and_demo_load_roundtrip(tmp_path):
    from posebyte_tpu.cli.export import main as export_main
    from posebyte_tpu.cli.demo import load_model_params
    out = str(tmp_path / "m.safetensors")
    rc = export_main(["-m", "yolov8n-pose", "-o", out, "--no-compile"])
    assert rc == 0
    params, name = load_model_params(out)
    assert name == "yolov8n-pose"
    assert params is not None


def test_benchmark_cli_json(capsys):
    from posebyte_tpu.cli.benchmark import main as bench_main
    rc = bench_main(["-n", "2", "--json"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    for key in ["kalman136_predict_ms", "oks_50x100_ms",
                "auction_50x50_ms", "pose_nms_100_ms", "tracker_step_ms"]:
        assert key in data and data[key] > 0


def test_w8a8_calibration_and_forward():
    from posebyte_tpu.models.quant import (quantize_params,
                                           calibrate_activations)
    apply_fn, init_fn = build_model("yolov8n-pose")
    params = init_fn(jax.random.PRNGKey(0))
    q = quantize_params(params)
    imgs = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    q = calibrate_activations(q, "yolov8n-pose", imgs)
    # act_scale attached to quantized convs only
    assert "act_scale" in q["b9"]["cv1"]
    assert "act_scale" not in q["b0"]
    # forward runs through the int8 path and stays close on confidences
    x = jnp.asarray(imgs[:1])
    ref = jax.jit(apply_fn)(params, x)
    got = jax.jit(apply_fn)(q, x)
    np.testing.assert_allclose(np.asarray(got[0, 4]),
                               np.asarray(ref[0, 4]), atol=0.15)


def test_int8_engine_save_load_roundtrip(tmp_path):
    from posebyte_tpu.models.quant import calibrate_and_quantize
    from posebyte_tpu.models.weights import save_params, load_params
    _, init_fn = build_model("yolov8n-pose")
    params = init_fn(jax.random.PRNGKey(1))
    q = calibrate_and_quantize(params, "yolov8n-pose", input_size=64,
                               synthetic_fallback=True, n_synthetic=2)
    path = str(tmp_path / "int8.safetensors")
    save_params(q, path, "yolov8n-pose")
    loaded, name = load_params(path)
    assert name == "yolov8n-pose"
    assert loaded["b9"]["cv1"]["w"].dtype == jnp.int8
    assert "act_scale" in loaded["b9"]["cv1"]
    # int8 engine size is much smaller than fp32
    import os
    fp32_path = str(tmp_path / "fp32.safetensors")
    save_params(params, fp32_path, "yolov8n-pose")
    assert os.path.getsize(path) < 0.45 * os.path.getsize(fp32_path)


def test_export_cli_aot_flag(tmp_path):
    from posebyte_tpu.cli.export import main as export_main
    out = str(tmp_path / "m.safetensors")
    aot = str(tmp_path / "m.stablehlo")
    rc = export_main(["-m", "yolov8n-pose", "-o", out, "--no-compile",
                      "--aot", aot, "--size", "64"])
    assert rc == 0
    import os
    assert os.path.getsize(aot) > 1_000_000
    from posebyte_tpu.models.aot import load_engine_aot
    eng = load_engine_aot(aot)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    assert eng(x).shape == (1, 56, 84)


def test_calibration_cache_roundtrip(tmp_path):
    """Scales persist to a cache file and re-attach to a fresh
    quantization without images (Int8EntropyCalibrator cache parity,
    yolo_pose_engine.cpp:144-164)."""
    from posebyte_tpu.models.quant import (calibrate_and_quantize,
                                           conv_paths,
                                           load_calibration_cache,
                                           quantize_params,
                                           save_calibration_cache)
    _, init_fn = build_model("yolov8n-pose")
    params = init_fn(jax.random.PRNGKey(2))
    q1 = calibrate_and_quantize(params, "yolov8n-pose", input_size=64,
                                synthetic_fallback=True, n_synthetic=2)
    cache = str(tmp_path / "calib.json")
    n_saved = save_calibration_cache(q1, cache)
    assert n_saved > 0

    q2 = quantize_params(init_fn(jax.random.PRNGKey(2)))
    n_loaded = load_calibration_cache(q2, cache)
    assert n_loaded == n_saved
    s1 = {p: float(np.asarray(n["act_scale"]))
          for p, n in conv_paths(q1).items() if "act_scale" in n}
    s2 = {p: float(np.asarray(n["act_scale"]))
          for p, n in conv_paths(q2).items() if "act_scale" in n}
    assert s1 == s2

    # calibrate_and_quantize short-circuits to an existing cache
    q3 = calibrate_and_quantize(init_fn(jax.random.PRNGKey(2)),
                                "yolov8n-pose", input_size=64,
                                cache_path=cache)
    s3 = {p: float(np.asarray(n["act_scale"]))
          for p, n in conv_paths(q3).items() if "act_scale" in n}
    assert s3 == s1


def test_no_calibration_source_is_weight_only():
    """Without images/cache/explicit opt-in, no act_scales attach —
    never silently ship noise-calibrated engines (VERDICT r1 item 7)."""
    from posebyte_tpu.models.quant import (calibrate_and_quantize,
                                           conv_paths)
    _, init_fn = build_model("yolov8n-pose")
    q = calibrate_and_quantize(init_fn(jax.random.PRNGKey(0)),
                               "yolov8n-pose", input_size=64)
    assert not any("act_scale" in n for n in conv_paths(q).values())
    assert q["b9"]["cv1"]["w"].dtype == jnp.int8   # weights still int8
