"""Test configuration: force CPU backend with an 8-device virtual mesh so
sharding tests run without TPU hardware, and make the repo importable."""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The sandbox presets JAX_PLATFORMS=axon (TPU); tests always run on the CPU
# virtual mesh unless explicitly overridden.  pytest itself imports jax via a
# plugin before this conftest runs, so env vars alone are not enough -- use
# jax.config (backends are not initialized yet at collection time).
os.environ["JAX_PLATFORMS"] = os.environ.get("DIFUSION_TEST_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CKPT = "/root/reference/pytorch/ckpt/default/hyper.json"


def reference_ckpt_available() -> bool:
    return os.path.exists(REFERENCE_CKPT)
