"""Weight import tests: torch-layer numerical equivalence, BN folding,
checkpoint stub-unpickling, and safetensors round trip."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from posebyte_tpu.models import build_model, init_params  # noqa: E402
from posebyte_tpu.models import layers as L  # noqa: E402
from posebyte_tpu.models.weights import (_fused_conv, _plain_conv,  # noqa
                                         load_ultralytics_checkpoint,
                                         convert_state_dict, save_params,
                                         load_params, BN_EPS)


def _torch_conv_bn_silu(cin, cout, k, stride, seed=0):
    torch.manual_seed(seed)
    conv = torch.nn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
    bn = torch.nn.BatchNorm2d(cout, eps=BN_EPS)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-0.5, 0.5)
    bn.running_mean.uniform_(-1, 1)
    bn.running_var.uniform_(0.5, 2.0)
    bn.eval()
    return conv, bn


def test_fused_conv_matches_torch():
    cin, cout, k, stride = 8, 16, 3, 2
    conv, bn = _torch_conv_bn_silu(cin, cout, k, stride)
    sd = {
        "m.conv.weight": conv.weight.detach().numpy(),
        "m.bn.weight": bn.weight.detach().numpy(),
        "m.bn.bias": bn.bias.detach().numpy(),
        "m.bn.running_mean": bn.running_mean.numpy(),
        "m.bn.running_var": bn.running_var.numpy(),
    }
    p = _fused_conv(sd, "m")
    x = np.random.default_rng(0).normal(size=(1, 12, 12, cin)) \
        .astype(np.float32)
    with torch.no_grad():
        want = torch.nn.functional.silu(
            bn(conv(torch.from_numpy(x.transpose(0, 3, 1, 2))))
        ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(L.conv_block(
        jax.tree.map(jnp.asarray, p), jnp.asarray(x), stride))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_plain_conv_matches_torch():
    conv = torch.nn.Conv2d(8, 4, 1, bias=True)
    sd = {"c.weight": conv.weight.detach().numpy(),
          "c.bias": conv.bias.detach().numpy()}
    p = _plain_conv(sd, "c")
    x = np.random.default_rng(1).normal(size=(1, 6, 6, 8)).astype(np.float32)
    with torch.no_grad():
        want = conv(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)
    got = np.asarray(L.conv2d(jax.tree.map(jnp.asarray, p), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_maxpool_matches_torch():
    x = np.random.default_rng(2).normal(size=(1, 8, 8, 4)).astype(np.float32)
    got = np.asarray(L._maxpool(jnp.asarray(x), 5))
    with torch.no_grad():
        want = torch.nn.functional.max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 5, 1, 2
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_upsample_matches_torch():
    x = np.random.default_rng(3).normal(size=(1, 4, 4, 2)).astype(np.float32)
    got = np.asarray(L.upsample2x(jnp.asarray(x)))
    with torch.no_grad():
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
            mode="nearest").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_stub_unpickler_extracts_tensors(tmp_path):
    # Build a checkpoint whose classes will NOT exist at load time:
    # emulate an ultralytics checkpoint with custom container classes.
    import types, sys

    mod = types.ModuleType("fake_ultralytics")

    class FakeModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(3, 4, 3)
            self.bn = torch.nn.BatchNorm2d(4)

    FakeModel.__module__ = "fake_ultralytics"
    FakeModel.__qualname__ = "FakeModel"
    mod.FakeModel = FakeModel
    sys.modules["fake_ultralytics"] = mod
    m = FakeModel()
    path = tmp_path / "ckpt.pt"
    torch.save({"model": m, "epoch": 3}, path)
    del sys.modules["fake_ultralytics"]   # class no longer importable

    sd = load_ultralytics_checkpoint(str(path))
    assert "conv.weight" in sd
    assert sd["conv.weight"].shape == (4, 3, 3, 3)
    assert sd["bn.running_mean"].shape == (4,)
    np.testing.assert_allclose(sd["conv.weight"],
                               m.conv.weight.detach().numpy(), rtol=1e-6)


def _synthetic_ultralytics_sd(name):
    """Build an ultralytics-style state dict with the right shapes by
    inverting our own randomly-initialized tree (conv bias -> bn with
    identity stats so folding reproduces the same params)."""
    params = init_params(jax.random.PRNGKey(3), name)
    sd = {}

    def emit_conv(prefix, p, fused=True):
        w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))   # HWIO -> OIHW
        if fused:
            cout = w.shape[0]
            sd[f"{prefix}.conv.weight"] = w
            sd[f"{prefix}.bn.weight"] = np.ones(cout, np.float32)
            sd[f"{prefix}.bn.bias"] = np.asarray(p["b"])
            sd[f"{prefix}.bn.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.bn.running_var"] = np.full(
                cout, 1.0 - BN_EPS, np.float32)
        else:
            sd[f"{prefix}.weight"] = w
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def walk(node, prefix, plain=False):
        if isinstance(node, dict):
            if set(node) == {"w", "b"}:
                emit_conv(prefix, node, fused=not plain)
                return
            for k, v in node.items():
                walk_key(v, prefix, k)
        elif isinstance(node, (list, tuple)):
            if len(node) == 2 and isinstance(node[0], L.Static):
                walk(node[1], prefix)    # c3k2 inner (kind, params)
            else:
                for i, v in enumerate(node):
                    walk(v, f"{prefix}.{i}")

    def walk_key(v, prefix, k):
        if isinstance(v, L.Static):
            return
        if isinstance(v, tuple) and len(v) == 2 and \
                isinstance(v[0], L.Static):
            walk(v[1], prefix)   # c3k2 inner (kind, params)
            return
        walk(v, f"{prefix}.{k}")

    # backbone/neck names from the converter layout
    from posebyte_tpu.models.weights import _V8_LAYOUT, _V11_LAYOUT
    from posebyte_tpu.models.yolo_pose import MODEL_CONFIGS
    cfg = MODEL_CONFIGS[name]
    layout = _V8_LAYOUT if cfg.family == "v8" else _V11_LAYOUT
    for key, idx, kind in layout:
        node = params[key]
        if kind == "conv":
            emit_conv(f"model.{idx}", node)
        elif kind == "c2psa":
            pre = f"model.{idx}"
            emit_conv(f"{pre}.cv1", node["cv1"])
            emit_conv(f"{pre}.cv2", node["cv2"])
            for i, m in enumerate(node["m"]):
                emit_conv(f"{pre}.m.{i}.attn.qkv", m["attn"]["qkv"])
                emit_conv(f"{pre}.m.{i}.attn.proj", m["attn"]["proj"])
                emit_conv(f"{pre}.m.{i}.attn.pe", m["attn"]["pe"])
                emit_conv(f"{pre}.m.{i}.ffn.0", m["ffn1"])
                emit_conv(f"{pre}.m.{i}.ffn.1", m["ffn2"])
        else:
            walk(node, f"model.{idx}")
    hi = 22 if cfg.family == "v8" else 23
    head = params["head"]
    for i in range(3):
        for branch in ("cv2", "cv3", "cv4"):
            for k, p in head[branch][i].items():
                prefix = f"model.{hi}.{branch}.{i}"
                if k == "2":
                    emit_conv(f"{prefix}.2", p, fused=False)
                elif k.endswith("_dw"):
                    j = k[0]
                    emit_conv(f"{prefix}.{j}.0", p)
                elif k.endswith("_pw"):
                    j = k[0]
                    emit_conv(f"{prefix}.{j}.1", p)
                else:
                    emit_conv(f"{prefix}.{k}", p)
    return params, sd


@pytest.mark.parametrize("name", ["yolov8n-pose", "yolo11n-pose"])
def test_convert_state_dict_roundtrip(name):
    ref_params, sd = _synthetic_ultralytics_sd(name)
    got = convert_state_dict(sd, name)
    ref_leaves = jax.tree.leaves(ref_params)
    got_leaves = jax.tree.leaves(got)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_save_load_params_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(0), "yolov8n-pose")
    path = str(tmp_path / "model.safetensors")
    save_params(params, path, "yolov8n-pose")
    loaded, name = load_params(path)
    assert name == "yolov8n-pose"
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # loaded params drive the model
    apply_fn, _ = build_model("yolov8n-pose")
    out = jax.jit(apply_fn)(loaded, jnp.zeros((1, 64, 64, 3)))
    assert out.shape[1] == 56


def test_aot_engine_roundtrip(tmp_path):
    from posebyte_tpu.models.aot import export_engine_aot, load_engine_aot
    params = init_params(jax.random.PRNGKey(0), "yolov8n-pose")
    path = str(tmp_path / "engine.stablehlo")
    size = export_engine_aot(params, "yolov8n-pose", path, batch=1,
                             input_size=64, dtype=jnp.float32)
    assert size > 1_000_000          # weights baked in

    engine = load_engine_aot(path)
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    got = engine(jnp.asarray(x))
    apply_fn, _ = build_model("yolov8n-pose", jnp.float32)
    want = jax.jit(apply_fn)(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
