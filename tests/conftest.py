"""Test configuration: run everything on a virtual 8-device CPU mesh.

(SURVEY.md §4: multi-host correctness is tested via XLA's host-platform
device simulation.) Env vars alone are not enough because pytest plugins may
import jax before this conftest runs; jax.config.update works as long as the
backend has not been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the persistent compile cache is keyed for the TPU host; avoid noisy
# machine-feature mismatch warnings in CPU test runs
os.environ["GUARDX_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
