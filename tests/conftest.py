"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding code
paths are exercised without TPU hardware (the reference has no equivalent;
see SURVEY.md §4). Environment must be set before jax is imported.
"""

import os

# Never attempt a checkpoint download from inside the suite (no egress
# here; tests that exercise fetching monkeypatch this off and use
# file:// URLs).
os.environ.setdefault("MAEST_TPU_OFFLINE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU even when a TPU plugin was registered by sitecustomize.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
