"""Model-layer tests: s2d stem equivalence, head output layout."""
import numpy as np
import jax
import jax.numpy as jnp

from posebyte_tpu.models import layers as L
from posebyte_tpu.models import build_model, make_anchors


def test_conv_s2d_exact(rng):
    for C, O, H in [(3, 16, 64), (16, 32, 32), (8, 24, 16)]:
        p = L.conv_init(jax.random.PRNGKey(C), C, O, 3)
        x = jnp.asarray(rng.normal(size=(2, H, H, C)).astype(np.float32))
        a = L.conv_block(p, x, 2)
        b = L.conv_block_s2d(p, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_conv_s2d_quantized(rng):
    from posebyte_tpu.models.quant import _quantize_conv
    p = L.conv_init(jax.random.PRNGKey(0), 16, 32, 3)
    q = jax.tree.map(jnp.asarray, _quantize_conv(
        {k: np.asarray(v) for k, v in p.items()}))
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16)).astype(np.float32))
    a = L.conv_block(q, x, 2)
    b = L.conv_block_s2d(q, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_anchor_layout():
    anchors, strides = make_anchors(640)
    assert anchors.shape == (8400, 2)
    # first anchor of each level at (0.5, 0.5); strides 8/16/32
    assert strides[0] == 8 and strides[6400] == 16 and strides[8000] == 32
    np.testing.assert_allclose(anchors[0], [0.5, 0.5])
    # anchors in pixel space: grid center * stride covers the full image
    np.testing.assert_allclose(anchors[6399] * 8, [636.0, 636.0])


def test_head_output_rows_are_pixel_space():
    apply_fn, init_fn = build_model("yolov8n-pose")
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    raw = np.asarray(jax.jit(apply_fn)(params, x))[0]
    assert raw.shape == (56, 84)   # 8x8 + 4x4 + 2x2
    # confidences are sigmoids
    assert (raw[4] >= 0).all() and (raw[4] <= 1).all()
    kp_conf = raw[5 + 2::3]
    assert (kp_conf >= 0).all() and (kp_conf <= 1).all()
    # boxes live in input-pixel space
    assert raw[0].max() <= 64 * 2 and raw[0].min() >= -64


import pytest
from posebyte_tpu.models import MODEL_CONFIGS


@pytest.mark.parametrize("name", sorted(MODEL_CONFIGS))
def test_every_model_forward(name):
    apply_fn, init_fn = build_model(name)
    params = init_fn(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = jax.jit(apply_fn)(params, x)
    assert out.shape == (1, 56, 84)
    assert bool(jnp.isfinite(out).all())


def test_packed_stem_matches_plain():
    """Frame-packed stem (block-diagonal weights over 8 frames) is
    numerically equivalent to the per-frame stem, end to end through
    the heads, for both families."""
    import jax
    from posebyte_tpu.models.yolo_pose import build_model_heads

    for name in ("yolov8n-pose", "yolo11n-pose"):
        plain, init_fn = build_model_heads(name, jnp.float32)
        packed, _ = build_model_heads(name, jnp.float32, packed_stem=4)
        params = init_fn(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3))
        a = jax.jit(plain)(params, x)
        b = jax.jit(packed)(params, x)
        for ref, got in zip(a, b):
            np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                       atol=2e-5, err_msg=name)
        # non-divisible batch falls back to the plain path
        x5 = x[:5]
        c = jax.jit(packed)(params, x5)
        for ref, got in zip(jax.jit(plain)(params, x5), c):
            np.testing.assert_array_equal(np.asarray(ref),
                                          np.asarray(got))
