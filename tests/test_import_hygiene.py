"""Importing the package must not initialize a device backend.

A module-level `jnp.asarray(...)` anywhere in the import graph calls
device_put, which instantiates the default backend — on deployment
hosts that means dialing the TPU (and on this measurement host, the
relay tunnel: if the relay is down, `import posebyte_tpu` would hang
forever; ops/oks.py had exactly this bug). Backend construction must
stay lazy until the user actually runs something.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_import_initializes_no_backend():
    code = (
        "import posebyte_tpu, posebyte_tpu.ops, posebyte_tpu.models,"
        " posebyte_tpu.pipeline, posebyte_tpu.tracker,"
        " posebyte_tpu.parallel, posebyte_tpu.utils.synthetic,"
        " posebyte_tpu.utils.video, posebyte_tpu.cli;"
        "import jax;"
        "backends = jax._src.xla_bridge._backends;"
        "assert not backends, f'backend initialized at import: '"
        "f'{list(backends)}';"
        "print('CLEAN')"
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # hermetic (see _cpu_env)
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       capture_output=True, text=True, timeout=300,
                       env=env)
    assert r.returncode == 0 and "CLEAN" in r.stdout, r.stderr[-2000:]
