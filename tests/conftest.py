"""Test configuration.

Tests run on the CPU backend with a faked 8-device mesh
(SURVEY.md section 4.2: `xla_force_host_platform_device_count` is the
standard JAX trick for exercising sharding/collective logic without TPUs)
and with x64 enabled so the f64 correctness path is the default under test.

Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU sitecustomize force-registers the axon platform and resets
# jax_platforms to "axon,cpu" at interpreter start; the env var alone does
# not stick.  Override after import, before any backend is instantiated.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
