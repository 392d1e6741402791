"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU-native "fake cluster" the reference lacks (SURVEY.md §4):
multi-chip sharding paths (fsdp/sp/dp/tp) compile and execute on fake CPU
devices; TPU-only kernels fall back to the XLA attention backend.

If the TPU-tunnel plugin is active in the parent environment (it hooks
every interpreter via sitecustomize and routes XLA compiles through a
remote relay — ~40x slowdown for CPU tests), re-exec pytest once with a
clean CPU-only environment.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and \
        not os.environ.get("_UNIVID_TEST_REEXEC"):
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "AXON_LOOPBACK_RELAY"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["_UNIVID_TEST_REEXEC"] = "1"
    os.execvpe(sys.executable,
               [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
