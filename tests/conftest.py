"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md
section 4's implication: mesh logic tested via
--xla_force_host_platform_device_count).

Forcing matters: the axon environment exports JAX_PLATFORMS=axon and its
sitecustomize registers the TPU-tunnel backend, so a setdefault is a no-op
and the env var alone is not honored -- jax.config.update('jax_platforms')
before first backend use is what actually selects CPU."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (depth-10
# unrolled parity renderer, interpret-mode Pallas kernels); repeat runs
# hit the disk cache and drop from ~30 min to minutes.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_toypt"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    # Fail fast if the platform override did not take (e.g. a backend was
    # initialized before conftest ran): silently testing on one TPU would
    # skip every sharding test.
    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    assert len(devices) >= 8, devices


@pytest.fixture(scope="session")
def big_scene():
    from toypathtracer_tpu import make_scene
    return make_scene(big=True)


@pytest.fixture(scope="session")
def small_scene():
    from toypathtracer_tpu import make_scene
    return make_scene(big=False)


def load_golden(name):
    path = os.path.join(os.path.dirname(__file__), "golden", f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing (run tools/gen_golden.py)")
    return np.load(path)
