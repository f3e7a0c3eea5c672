"""The README-linked example must stay runnable end-to-end."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_minimal_tracking_example_runs():
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # hermetic CPU (see _cpu_env)
    # the example assumes an installed package; tests run from the tree
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # run on a plain 1-device host, as the example advertises (the
    # suite's 8-virtual-device XLA_FLAGS would force stream counts to
    # be mesh-divisible)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "minimal_tracking.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    assert "streamed 4 frames" in out
    assert "chunk of 8" in out
    assert "stream a outputs" in out
    assert "tcp front-end" in out
