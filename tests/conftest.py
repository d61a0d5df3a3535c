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


# Smoke tier: one fast representative test per subsystem, for mid-round
# iteration on slow (1-CPU) hosts where the full fast gate is 13-70 min.
# `pytest -m smoke` target: < 2 min warm-cache.  The full fast gate
# (`-m "not slow"`) remains the pre-commit bar.
_SMOKE = {
    "test_rng.py::test_rand01_matches_oracle",          # RNG oracle
    "test_rng.py::test_xorshift32_sequence",
    "test_parity.py::test_first_pixel_exact",           # golden parity
    "test_pallas.py::test_pallas_matches_jnp_bitexact",  # kernel bit-id
    "test_merged.py::test_merged_matches_unmerged_jnp",  # pipelined loop
    "test_wavefront.py::test_render_deterministic",
    "test_wavefront.py::test_progressive_blend_matches_formula",
    "test_sharding.py::test_sharded_matches_single_device",  # mesh
    "test_grad.py::test_albedo_grad_matches_fd",        # gradients
    "test_pallas_grad.py::test_grad_kernel_matches_jax_grad",
    "test_io_cli.py::test_cli_headless_render",         # CLI surface
    "test_checkpoint.py::test_progressive_resume_bitexact",
    "test_serve.py::test_viewer_steps_and_png",         # viewer surface
    "test_scaled.py::test_scaled_render_finite_and_lit",  # 100k config
    "test_native.py::test_native_srgb_matches_numpy",   # C++ runtime
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid is "tests/test_x.py::test_y" or "test_x.py::test_y"
        # depending on invocation dir; match on the trailing form.
        short = "/".join(item.nodeid.split("/")[-1:])
        if short in _SMOKE:
            item.add_marker(pytest.mark.smoke)


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
