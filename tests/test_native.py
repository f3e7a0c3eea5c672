"""Native host-runtime tests: build, drawing, CPU letterbox parity with
the device letterbox."""
import numpy as np
import pytest
import jax.numpy as jnp

from posebyte_tpu.utils import native
from posebyte_tpu.utils.video import TRACK_COLORS
from posebyte_tpu.tracker.output import TrackOutput
from posebyte_tpu.ops.preprocess import letterbox_image


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_letterbox_cpu_matches_device(lib, random_pose_factory):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (90, 160, 3), dtype=np.uint8)
    got = native.letterbox_cpu(img, target=64)
    want = np.asarray(letterbox_image(jnp.asarray(img), target=64))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_draw_tracks_native(lib, random_pose_factory):
    frame = np.zeros((480, 640, 3), np.uint8)
    pose = random_pose_factory(img_w=640, img_h=480)
    t = TrackOutput(track_id=3, score=0.9,
                    bbox=np.asarray([100, 100, 300, 400], np.float32),
                    keypoints=pose)
    out = native.draw_tracks_native(frame, [t], TRACK_COLORS)
    assert out.sum() > 0            # something was drawn
    # drawn in the track's palette color
    color = TRACK_COLORS[3 % len(TRACK_COLORS)]
    mask = (out == color).all(axis=-1)
    assert mask.sum() > 50


def test_draw_text(lib):
    frame = np.zeros((40, 200, 3), np.uint8)
    white = np.full(3, 255, np.uint8)
    lib.pb_draw_text(frame, 200, 40, 2, 2, b"ID:42 0.93", white, 2)
    assert (frame == 255).any()
