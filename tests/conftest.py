"""Test configuration: force an 8-virtual-device CPU JAX platform.

Tests never touch the real TPU; the sharding tests exercise an 8-device
host-platform mesh exactly as the driver's multi-chip dry-run does.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell may export JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs (CI, local loops) skip
# recompiling the big 5-level model graphs, which dominate wall-clock on the
# CPU runner. Cold runs are unaffected; warm runs drop by minutes.
# Key the cache by the host CPU so an AOT executable compiled on one
# machine is never loaded on another (XLA:CPU AOT results embed machine
# features; cross-machine reuse risks SIGILL).
import hashlib
import platform


def _host_signature() -> str:
    """Microarch-aware host key: platform.processor() is usually empty on
    Linux, so fold in the CPU feature flags from /proc/cpuinfo (they encode
    the ISA extensions AOT code may use) plus the hostname as a tiebreak."""
    parts = [platform.machine(), platform.processor(), platform.node()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return "|".join(parts)


_cpu_key = hashlib.sha1(_host_signature().encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser(f"~/.cache/lintransunet_jax_tests_{_cpu_key}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy golden-parity / flagship / model-level tests. Skipped "
        "by default so the tier-1 run fits the CPU runner's budget; enable "
        "with --runslow or LINTRANSUNET_RUN_SLOW=1 (the full CI tier).")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (the full tier)")


def pytest_collection_modifyitems(config, items):
    if (config.getoption("--runslow")
            or os.environ.get("LINTRANSUNET_RUN_SLOW") == "1"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: --runslow or LINTRANSUNET_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
