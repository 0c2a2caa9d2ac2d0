"""The shared wedged-relay helpers (cvad_tpu.runtime.doctor): one
implementation behind bench.py, cvad doctor/serve, __graft_entry__ and the
quickstart test."""

import os

from cvad_tpu.runtime.doctor import cpu_only_env, probe_devices


def test_cpu_only_env_strips_plugin_site():
    base = {"PYTHONPATH": os.pathsep.join(["/a", "/root/.axon_site", "/b"]),
            "OTHER": "x"}
    env = cpu_only_env(base, extra_pythonpath=["/repo"])
    assert env["PYTHONPATH"].split(os.pathsep) == ["/repo", "/a", "/b"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["CVAD_PLATFORM"] == "cpu"
    assert env["OTHER"] == "x"  # unrelated vars pass through


def test_cpu_only_env_empty_base():
    env = cpu_only_env({})
    assert env["PYTHONPATH"] == ""
    assert env["JAX_PLATFORMS"] == "cpu"


def test_probe_devices_timeout_is_bounded():
    """A probe that cannot finish in time reports 'timeout' instead of
    hanging — the property every wedged-relay guard relies on."""
    status, detail = probe_devices(0.05)
    assert status == "timeout"
    assert "did not answer" in detail
