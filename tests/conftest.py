"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run over
``--xla_force_host_platform_device_count=8`` CPU devices, and the real-TPU
bench path is exercised separately by bench.py.
"""

import os

# Must be set before jax is imported anywhere. The environment ships an
# "axon" TPU plugin whose sitecustomize registers itself regardless of
# JAX_PLATFORMS; clearing PALLAS_AXON_POOL_IPS disables that registration so
# the virtual CPU mesh actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin at interpreter start
# (before this conftest runs), so the env vars alone don't stick — force the
# platform through jax.config too. XLA_FLAGS is read lazily at CPU client
# creation, so the 8-device override above still applies.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: renderer tests build scene-capturing jit
# closures per Renderer instance; identical programs hit the cache across
# tests and across CI runs instead of recompiling.
jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _ensure_native_built() -> None:
    """Build native/librptr_native.so if a toolchain is available, so the
    ctypes fast path is tested rather than silently skipped (the analogue
    of the reference building ext/libvkr into every configuration)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lib = os.path.join(repo, "native", "build", "librptr_native.so")
    src = os.path.join(repo, "native", "vkr_decode.cpp")
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return
    try:
        subprocess.run(
            ["cmake", "-S", os.path.join(repo, "native"), "-B",
             os.path.join(repo, "native", "build"), "-G", "Ninja"],
            check=True, capture_output=True, timeout=120,
        )
        subprocess.run(
            ["cmake", "--build", os.path.join(repo, "native", "build")],
            check=True, capture_output=True, timeout=300,
        )
    except Exception:
        pass  # no toolchain: test_native.py keeps its skip marker


_ensure_native_built()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy end-to-end render (deselected by default on the "
        "1-CPU CI box; run with RPTR_RUN_SLOW=1 for the full suite)",
    )


def pytest_collection_modifyitems(config, items):
    """Keep the default run under ~5 min on the 1-CPU CI box: the
    heaviest end-to-end renders (~25 tests, ~8 min of XLA CPU compiles)
    only run with RPTR_RUN_SLOW=1. Every kernel/feature keeps a fast
    guard in the default set; the slow set re-renders them at full
    pipeline depth."""
    if os.environ.get("RPTR_RUN_SLOW", "") not in ("", "0"):
        return
    deselected = [i for i in items if "slow" in i.keywords]
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = [i for i in items if "slow" not in i.keywords]


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
