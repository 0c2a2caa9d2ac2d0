"""Test harness.

All tests run on CPU by default (deterministic float32 numerics, fast
compiles); the 8 virtual CPU devices simulate a multi-chip mesh for the
data-parallel tests (SURVEY.md §4: JAX's
``xla_force_host_platform_device_count`` trick).  This must be set before the
CPU backend initializes, hence the env mutation at import time.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# keep framework mesh construction (and thus compiles) on CPU in tests
os.environ.setdefault("CVAD_PLATFORM", "cpu")

import jax  # noqa: E402

# The suite is CPU-only by design. Under the axon env a wedged TPU relay
# makes backend DISCOVERY hang in any process where the plugin registered —
# even jax.devices("cpu"). Setting JAX_PLATFORMS=cpu in the environment
# does NOT help: the axon sitecustomize imports jax at interpreter startup,
# latching JAX_PLATFORMS=axon into the config before any user code runs.
# Re-pointing the latched config restricts discovery to the cpu backend
# (the axon factory stays registered, so 'tpu' remains a known platform for
# pallas lowering registrations — do NOT pop backend factories, measured to
# break that).
if os.environ.get("CVAD_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# NOTE: no persistent compilation cache here — the axon remote-compile
# service shares it and pollutes it with executables built for a different
# host CPU (XLA then warns about SIGILL risk when loading them).
import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="include tests marked slow (multi-epoch soaks, heavy "
             "parametrizations) — the full invariant set")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (soak/multi-epoch/large parametrization); "
        "deselected by default, enable with --runslow")


def pytest_collection_modifyitems(config, items):
    # the suite is compile-bound on this 1-core host (round-4 measured ~31
    # min cold for everything); the default run keeps the fast invariant
    # set and `--runslow` restores the full pass
    if config.getoption("--runslow"):
        return
    selected, deselected = [], []
    for item in items:
        (deselected if "slow" in item.keywords else selected).append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected


@pytest.fixture(autouse=True)
def _default_cpu():
    with jax.default_device(jax.devices("cpu")[0]):
        yield


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def cpu_mesh(cpu_devices):
    from cvad_tpu.runtime.mesh import create_mesh

    return create_mesh(devices=cpu_devices)


@pytest.fixture()
def rng():
    return jax.random.key(0)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def load_reference_module(name: str):
    """Import a reference script by path (parity oracles only — reference
    code is never copied into the framework).  torchvision is absent in this
    environment; stub its transforms namespace so module-level imports in the
    reference succeed (the oracles under test never use it)."""
    import importlib.util
    import sys
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms

    path = os.path.join(REFERENCE_DIR, f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")
