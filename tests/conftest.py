"""Test configuration: run everything on a virtual 8-device CPU mesh.

(SURVEY.md §4: multi-host correctness is tested via XLA's host-platform
device simulation.) Env vars alone are not enough because pytest plugins may
import jax before this conftest runs; jax.config.update works as long as the
backend has not been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the framework's persistent compile cache is keyed for the TPU host;
# tests get their OWN CPU-keyed cache instead (set GUARDX_TEST_NO_CACHE=1
# to force cold compiles) — warm runs of the quick tier drop from ~13 min
# to a few minutes on this 2-core host
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

if not os.environ.get("GUARDX_TEST_NO_CACHE"):
    cache_dir = os.environ.get(
        "GUARDX_TEST_CACHE_DIR",
        os.path.expanduser("~/.cache/guardx_tpu_test_jit"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
