import os
import subprocess
import sys

import jax
import numpy as np

import pytest


pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_self_provisions_in_single_device_env():
    """Fresh subprocess with a 1-device backend env (the driver's failure
    mode in round 1: JAX_PLATFORMS exposing a single chip). dryrun_multichip
    must provision its own 8 virtual CPU devices before backend init —
    without conftest.py's help."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # default CPU backend: exactly 1 device
    env.pop("XLA_FLAGS", None)  # no pre-forced host device count
    env["PYTHONPATH"] = REPO
    code = (
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "import jax\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        "print('DRYRUN_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout
