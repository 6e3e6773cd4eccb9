"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4).

Must run before any jax import — pytest imports conftest first. The same
shard_map/all-to-all code paths then run unmodified on real TPU slices.
Perf tests that need the real chip are marked `tpu` and skipped here.
"""
import os

# Force CPU even if the session env preselects the TPU platform (e.g.
# JAX_PLATFORMS=axon): unit/dist tests must not contend for the one real
# chip (each eager op would cross the TPU tunnel at ~2s RTT), and the
# virtual 8-device mesh only exists on the host platform. The environment
# pre-imports jax via a sitecustomize on PYTHONPATH, so the env var alone
# is too late — use jax.config.update, which still works before first
# backend use. Real-hardware perf tests opt back in via the `tpu` marker.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires real TPU hardware (skipped in CPU CI)")


def pytest_collection_modifyitems(config, items):
    import jax

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    skip = pytest.mark.skip(reason="needs real TPU; tests run on CPU mesh")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache():
    """Clear jax's jit/lowering caches after every test MODULE.

    VERDICT r4 weak #5: a single-process `python -m pytest` of the full
    suite stopped finishing (>83 min; the same tests split into two
    processes pass in ~16 min total). Cause: the CPU backend's
    compilation + lowering caches grow monotonically across the
    suite's ~100 distinctly-shaped pipelines, and late modules'
    compiles slow down superlinearly under the accumulated cache/arena
    state. Per-module clearing bounds that growth at the cost of a few
    intra-module recompiles (measured: full suite in one process drops
    back under the split-run total; see BENCH_NOTES round-5)."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
