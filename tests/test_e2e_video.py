"""End-to-end video demo test: synthesize a clip, run the demo CLI,
verify the output video exists and the loop completes."""
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    """Subprocess env that is hermetically CPU: JAX_PLATFORMS=cpu alone
    is NOT enough (sitecustomize registers the tunneled-TPU backend and
    pins the platform whenever PALLAS_AXON_POOL_IPS is set, and a dead
    relay then hangs the child forever) — drop the trigger variable."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/make_test_video.py"),
         "--out", path, "--frames", "12", "--size", "320x240",
         "--persons", "2"],
        capture_output=True, text=True,
        env=_cpu_env())
    assert r.returncode == 0, r.stderr
    return path


def test_video_reader_writer(test_video, tmp_path):
    from posebyte_tpu.utils.video import VideoReader, VideoWriter
    reader = VideoReader(test_video)
    assert reader.width == 320 and reader.height == 240
    frames = list(reader)
    assert len(frames) == 12
    out = str(tmp_path / "copy.mp4")
    writer = VideoWriter(out, 320, 240, 30.0)
    for f in frames:
        writer.write(f)
    writer.release()
    assert os.path.getsize(out) > 0


def test_demo_cli_end_to_end(test_video, tmp_path):
    from posebyte_tpu.cli.demo import main
    out = str(tmp_path / "tracked.mp4")
    rc = main(["-e", "yolov8n-pose", "-i", test_video, "-o", out,
               "-c", "0.30", "--precision", "fp32", "-v"])
    assert rc == 0
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_demo_cli_decode_variant_flags(test_video, tmp_path):
    from posebyte_tpu.cli.demo import main
    out = str(tmp_path / "tracked_bisect.mp4")
    rc = main(["-e", "yolov8n-pose", "-i", test_video, "-o", out,
               "-c", "0.30", "--precision", "fp32",
               "--topk-impl", "bisect", "--gather-impl", "onehot"])
    assert rc == 0
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_demo_cli_chunked(test_video, tmp_path):
    from posebyte_tpu.cli.demo import main
    out = str(tmp_path / "tracked_chunk.mp4")
    rc = main(["-e", "yolov8n-pose", "-i", test_video, "-o", out,
               "-c", "0.30", "--precision", "fp32", "--chunk", "4"])
    assert rc == 0
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_demo_cli_save_resume_state(test_video, tmp_path):
    from posebyte_tpu.cli.demo import main
    state_path = str(tmp_path / "state.safetensors")
    rc = main(["-e", "yolov8n-pose", "-i", test_video, "-c", "0.30",
               "--precision", "fp32", "--save-state", state_path])
    assert rc == 0 and os.path.exists(state_path)
    rc = main(["-e", "yolov8n-pose", "-i", test_video, "-c", "0.30",
               "--precision", "fp32", "--resume-state", state_path])
    assert rc == 0


def test_evaluate_cli_smoke(tmp_path, capsys):
    """evaluate CLI runs the pipeline against GT and emits metrics
    (random weights -> scores near zero; the contract is the harness)."""
    import subprocess, sys, os, json
    video = str(tmp_path / "v.mp4")
    gt = str(tmp_path / "gt.npz")
    root = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/make_test_video.py"),
         "--out", video, "--frames", "8", "--size", "320x240",
         "--persons", "2", "--gt", gt],
        capture_output=True, text=True,
        env=_cpu_env())
    assert r.returncode == 0, r.stderr

    from posebyte_tpu.cli.evaluate import main as eval_main
    rc = eval_main(["-e", "yolov8n-pose", "-i", video, "-g", gt,
                    "--size", "192", "--max-frames", "5", "--json"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    for key in ("frames", "MOTA", "mAP", "AP50", "id_switches"):
        assert key in data
    assert data["frames"] == 5


def test_prefetch_reader_matches_plain(tmp_path):
    """PrefetchVideoReader yields the same frames in the same order as
    VideoReader and terminates cleanly."""
    import subprocess, sys, os
    video = str(tmp_path / "p.mp4")
    root = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/make_test_video.py"),
         "--out", video, "--frames", "12", "--size", "160x120"],
        capture_output=True, text=True,
        env=_cpu_env())
    assert r.returncode == 0, r.stderr

    from posebyte_tpu.utils.video import PrefetchVideoReader, VideoReader
    plain = [f.copy() for f in VideoReader(video)]
    pre = PrefetchVideoReader(video, depth=3)
    fetched = [f.copy() for f in pre]
    pre.release()
    assert len(fetched) == len(plain) == 12
    for a, b in zip(plain, fetched):
        np.testing.assert_array_equal(a, b)


def test_evaluate_cli_chunked_matches_per_frame(tmp_path, capsys):
    """--chunk evaluation produces the same metrics as per-frame."""
    import subprocess, sys, os, json
    video = str(tmp_path / "vc.mp4")
    gt = str(tmp_path / "gtc.npz")
    root = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/make_test_video.py"),
         "--out", video, "--frames", "6", "--size", "320x240",
         "--persons", "2", "--gt", gt],
        capture_output=True, text=True,
        env=_cpu_env())
    assert r.returncode == 0, r.stderr

    from posebyte_tpu.cli.evaluate import main as eval_main
    results = []
    for extra in ([], ["--chunk", "4"]):     # 6 frames = chunk 4 + tail 2
        rc = eval_main(["-e", "yolov8n-pose", "-i", video, "-g", gt,
                        "--size", "192", "--json"] + extra)
        assert rc == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        results.append(json.loads(line))
    assert results[0]["frames"] == results[1]["frames"] == 6
    for key in ("MOTA", "mAP", "misses", "false_positives"):
        assert results[0][key] == results[1][key], key
