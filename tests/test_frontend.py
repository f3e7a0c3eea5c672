"""Socket serving front-end (pipeline/frontend.py): protocol round
trip, tracking through the wire, backpressure, errors — over a real
loopback TCP socket with the oracle detector on the 8-virtual-device
CPU mesh."""
import time

import jax
import numpy as np
import pytest

from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                      TrackerConfig)
from posebyte_tpu.models.oracle import (encode_oracle_head,
                                        make_oracle_heads)
from posebyte_tpu.ops.preprocess import letterbox_params
from posebyte_tpu.parallel import make_mesh
from posebyte_tpu.pipeline.frontend import PoseClient, PoseServingFrontend
from posebyte_tpu.pipeline.serving import StreamServer
from posebyte_tpu.utils.synthetic import SyntheticScene, pose_bbox

H, W, S = 96, 128, 64
CONFIG = PipelineConfig(
    detector=DetectorConfig(input_size=S, num_anchors=84,
                            max_candidates=16, max_detections=4),
    tracker=TrackerConfig(max_tracks=8, max_detections=4, min_hits=1),
)


def _oracle_server():
    """StreamServer whose detector always reports one fixed person."""
    scene = SyntheticScene(1, W, H, seed=5, scale_range=(30.0, 40.0),
                           speed=0.0)
    gt = scene.step()                                  # frame coords
    scale, _, _, pad_x, pad_y = letterbox_params(W, H, S)
    gt_in = gt.copy()
    gt_in[:, :, :2] = gt_in[:, :, :2] * scale + (pad_x, pad_y)
    boxes_in = np.stack([pose_bbox(p) for p in gt_in])
    head = encode_oracle_head(gt_in, boxes_in,
                              np.asarray([0.9], np.float32), S)
    srv = StreamServer(num_streams=8, frame_shape=(H, W), config=CONFIG,
                       mesh=make_mesh(8), params=head,
                       dtype=jax.numpy.float32,
                       heads_fn=make_oracle_heads())
    return srv, gt


@pytest.fixture(scope="module")
def frontend():
    srv, gt = _oracle_server()
    fe = PoseServingFrontend(srv, max_queue=2, auto_step=False)
    yield fe, gt
    fe.close()


def test_tracking_roundtrip_over_socket(frontend):
    """Frames in over TCP -> tracked outputs back in FRAME pixel
    coordinates matching the ground truth; stable track id."""
    fe, gt = frontend
    cli = PoseClient(*fe.address)
    sid = cli.open_stream()
    frame = np.zeros((H, W, 3), np.uint8)    # oracle ignores pixels
    ids = set()
    got = []
    for _ in range(3):
        assert cli.send_frame(sid, frame)
        assert fe.step_once() == 1
        got += cli.poll(sid)
    assert len(got) == 3
    for tracks in got:
        assert len(tracks) == 1
        ids.add(tracks[0]["id"])
        kp = np.asarray(tracks[0]["keypoints"], np.float32)
        # un-letterboxed back to frame coordinates: matches GT closely
        np.testing.assert_allclose(kp[:, :2], gt[0][:, :2], atol=2.0)
    assert len(ids) == 1                      # identity stable
    assert cli.poll(sid) == []                # drained
    cli.close_stream(sid)
    cli.close()


def test_two_clients_isolated_streams(frontend):
    fe, _ = frontend
    c1, c2 = PoseClient(*fe.address), PoseClient(*fe.address)
    s1, s2 = c1.open_stream(), c2.open_stream()
    assert s1 != s2
    frame = np.zeros((H, W, 3), np.uint8)
    c1.send_frame(s1, frame)
    fe.step_once()
    assert len(c1.poll(s1)) == 1
    assert c2.poll(s2) == []                  # nothing leaked across
    c1.close_stream(s1)
    c2.close_stream(s2)
    c1.close()
    c2.close()


def test_backpressure_busy(frontend):
    """With the stepper paused, the (max_queue+1)-th frame is refused
    with BUSY, not buffered; after a step the stream accepts again."""
    fe, _ = frontend
    cli = PoseClient(*fe.address)
    sid = cli.open_stream()
    frame = np.zeros((H, W, 3), np.uint8)
    assert cli.send_frame(sid, frame)
    assert cli.send_frame(sid, frame)
    assert not cli.send_frame(sid, frame)     # queue bound = 2 -> BUSY
    fe.step_once()                            # consumes one frame
    assert cli.send_frame(sid, frame)         # accepted again
    while fe.step_once():
        pass
    cli.poll(sid)
    cli.close_stream(sid)
    cli.close()


def test_protocol_errors(frontend):
    fe, _ = frontend
    cli = PoseClient(*fe.address)
    with pytest.raises(RuntimeError):         # unopened stream
        cli.send_frame(99, np.zeros((H, W, 3), np.uint8))
    sid = cli.open_stream()
    with pytest.raises(RuntimeError):         # wrong frame geometry
        cli.send_frame(sid, np.zeros((10, 10, 3), np.uint8))
    stats = cli.stats()
    assert stats["open_streams"] >= 1
    cli.close_stream(sid)
    with pytest.raises(RuntimeError):         # double close
        cli.close_stream(sid)
    cli.close()


def test_auto_stepper_drives_device():
    """Production mode: the stepper thread consumes queued frames with
    no explicit step calls."""
    srv, _ = _oracle_server()
    fe = PoseServingFrontend(srv, max_queue=4, auto_step=True)
    try:
        cli = PoseClient(*fe.address)
        sid = cli.open_stream()
        frame = np.zeros((H, W, 3), np.uint8)
        for _ in range(3):
            assert cli.send_frame(sid, frame)
        got = []
        deadline = time.time() + 30.0
        while len(got) < 3 and time.time() < deadline:
            got += cli.poll(sid)
            time.sleep(0.05)
        assert len(got) == 3
        assert fe.stats()["frames_tracked"] >= 3
        cli.close_stream(sid)
        cli.close()
    finally:
        fe.close()
