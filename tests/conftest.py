"""Test configuration.

Tests run on the CPU backend with a faked 8-device mesh
(SURVEY.md section 4.2: `xla_force_host_platform_device_count` is the
standard JAX trick for exercising sharding/collective logic without TPUs)
and with x64 enabled so the f64 correctness path is the default under test.

Must run before jax is imported anywhere.
"""

import os
import sys

# SOCP_TPU_SMOKE=1 keeps the real TPU attached so `pytest -m tpu` can run
# the compiled-kernel smoke suite on hardware (tests/test_tpu_smoke.py);
# everything else runs on the faked CPU mesh.
_TPU_SMOKE = os.environ.get("SOCP_TPU_SMOKE") == "1"

if not _TPU_SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_SMOKE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU sitecustomize force-registers the axon platform and resets
# jax_platforms to "axon,cpu" at interpreter start; the env var alone does
# not stick.  Override after import, before any backend is instantiated.
import jax  # noqa: E402

if not _TPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the dd-driver graphs cost minutes of LLVM
# time per variant on a small CPU box; cached executables make repeat test
# runs (and reruns after unrelated edits) start in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_socp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs a real TPU; run with SOCP_TPU_SMOKE=1 pytest -m tpu",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    if _TPU_SMOKE:
        return
    skip_tpu = pytest.mark.skip(
        reason="TPU smoke test (set SOCP_TPU_SMOKE=1 and run -m tpu)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
