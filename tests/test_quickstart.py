"""The examples/quickstart.py lifecycle (train -> eval -> export -> blob
score -> HTTP score) runs end to end on CPU."""

import os
import subprocess

import pytest
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_quickstart_lifecycle(tmp_path):
    prog = (
        "import jax, sys\n"
        "jax.config.update('jax_default_device', jax.devices('cpu')[0])\n"
        f"sys.argv = ['quickstart', '--epochs', '1', '--batch-size', '4',"
        f" '--clips', '8', '--serve', '--out', {str(tmp_path)!r}]\n"
        f"exec(open({str(REPO / 'examples' / 'quickstart.py')!r}).read())\n"
    )
    # the subprocess must not register the axon plugin: under a wedged TPU
    # relay its backend discovery hangs (jax.devices('cpu') included) and
    # this test times out
    from cvad_tpu.runtime.doctor import cpu_only_env

    env = cpu_only_env()
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, timeout=540, cwd=REPO, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "exported" in r.stdout
    assert "HTTP scores:" in r.stdout
    assert (tmp_path / "scorer.jaxexport").exists()
