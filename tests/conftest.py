import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The image pins JAX_PLATFORMS=axon (remote TPU tunnel); tests run on the
# host CPU with 8 virtual devices for sharding tests.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated on CPU, and
# repeat runs (the common local loop) hit the cache instead of XLA
jax.config.update("jax_compilation_cache_dir", "/tmp/tc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (also enabled by RUN_SLOW=1)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow; use --runslow or RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)

import tensorcircuit_ng_tpu as tc


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module(request):
    """XLA-CPU process aging: with ~500 compiled programs live, late-suite
    compiles measure ~2x slower than fresh-process ones (mesh-engine test:
    66 s late vs 31 s fresh).  Dropping the in-memory jit caches between
    modules keeps the process young; cross-module program reuse is rare and
    repeat compiles hit the persistent cache configured above.

    The clear itself costs ~0.5-3 s on a loaded process, so SMALL modules
    (which add few live programs) skip it — only modules that materially
    age the process trigger the flush."""
    yield
    heavy = (
        "test_kernels", "test_mpscircuit", "test_timeevol_experimental",
        "test_periphery", "test_refparity_dmcircuit", "test_zx",
        "test_quantum", "test_sharded_state", "test_cross_simulator",
        "test_circuit", "test_dmcircuit_noise", "test_contractor_distributed",
        "test_u1_analog_pauliprop", "test_simplify_misc",
        "test_tensorflow_interface", "test_noisemodel_extra",
        "test_refparity_circuit", "test_fgs_qudit", "test_applications",
    )
    if any(h in str(request.node.name) for h in heavy):
        jax.clear_caches()


@pytest.fixture
def highp():
    tc.set_dtype("complex128")
    yield
    tc.set_dtype("complex64")


@pytest.fixture
def jaxb():
    # backend fixture kept for reference-parity in test bodies
    tc.set_backend("jax")
    yield
    tc.set_backend("jax")
