"""Test harness config: logic tests run on a virtual 8-device CPU mesh.

Multi-device tests exercise pjit/shard_map collectives without a real pod
via the host-platform device-count trick (SURVEY.md §4).  Must run before
jax initialises, hence the env mutation at import time.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Force CPU regardless of any pre-set JAX_PLATFORMS (the dev box tunnels a
# real TPU and its sitecustomize imports jax at interpreter startup, so the
# env var alone is too late — use the config API).  Set DEVT_TESTS_ON_TPU=1
# to run the TPU smoke tests against real hardware instead.
if not os.environ.get("DEVT_TESTS_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE: no persistent XLA compilation cache here.  An attempt to share
# /tmp cache entries across differently-flagged processes made XLA:CPU
# load AOT results whose target machine features mismatched the host
# ("+prefer-no-gather ... could lead to execution errors such as
# SIGILL") — silently different numerics between processes.  Compile
# time is paid per invocation instead.
