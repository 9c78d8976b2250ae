"""Test configuration: force a CPU backend with a virtual 8-device mesh.

The reference has no test framework (SURVEY.md §4); this suite formalizes its
four manual practices — golden-model differential testing, adversarial shapes,
cross-implementation agreement, bench-as-test — on CPU so it runs anywhere:
Pallas kernels execute in interpreter mode (utils/platform.py) and sharding
tests use 8 virtual devices. TPU-only perf tests are marked `tpu`.

Note: the axon sitecustomize registers a TPU backend before pytest starts, so
the platform must be overridden via jax.config *before any backend use* —
this import-time hook is the first JAX touch in the process.
"""

import os

import jax
import pytest

if os.environ.get("FLASHATTN_TPU_TEST_BACKEND", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass  # backend already initialized (e.g. driver chose TPU); run as-is


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (heavyweight model/fuzz/sharding "
             "soaks; the default tier is the pre-commit gate)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires a real TPU (skipped on CPU test runs)"
    )
    config.addinivalue_line("markers", "slow: long-running precision sweeps")


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip_tpu = pytest.mark.skip(reason="needs real TPU hardware")
    skip_slow = pytest.mark.skip(reason="slow soak — use --runslow")
    runslow = config.getoption("--runslow")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
        if "slow" in item.keywords and not runslow:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def mesh8():
    """8-device 1D mesh (virtual CPU devices) for sharding tests."""
    import numpy as np
    from jax.sharding import Mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    return Mesh(np.array(jax.devices()[:8]), axis_names=("x",))
