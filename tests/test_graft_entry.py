"""The driver's multichip dryrun must be self-sufficient.

Round-1 verdict weak #1: ``dryrun_multichip`` assumed the caller provided
n devices; in the driver environment the TPU plugin registers exactly one.
The entry point now re-executes itself in a subprocess with a virtual
n-device CPU platform, so it must pass from any parent environment.
"""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions():
    # Simulate the hostile driver environment: single-device parent, no
    # helpful XLA_FLAGS. The child must still see 8 devices.
    env = dict(os.environ)
    env.pop("_LEMON_TPU_DRYRUN_CHILD", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "assert len(jax.devices()) == 1, jax.devices();"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "one DP train step ok" in res.stdout
    assert "sharded kNN ok" in res.stdout
