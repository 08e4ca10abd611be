"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh; real-TPU
behavior is exercised by bench.py / the driver's dryrun and the opt-in
TPU tests (HEAL_TPU_TESTS_ON_TPU=1).

The axon TPU plugin registers itself from sitecustomize (via PYTHONPATH)
and overrides JAX_PLATFORMS=cpu, so when it is present the test process
re-execs itself once with a sanitized environment.
"""
import os
import sys

if os.environ.get("_AXON_REGISTERED") and not os.environ.get(
    "HEAL_TPU_TESTS_ON_TPU"
):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_AXON_REGISTERED"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# persistent compilation cache: the suite recompiles many mid-size
# programs; on this 1-core box the disk cache cuts several minutes
from heal_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
