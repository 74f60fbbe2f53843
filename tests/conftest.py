"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on virtual CPU devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin force-overrides JAX_PLATFORMS via its site hook, so the
# env var alone is not enough — pin the platform through jax.config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the device-entropy chain alone costs ~10 min
# of XLA compilation at test shapes; caching it makes repeat suite runs
# (and CI re-runs) pay it once. Separate dir from the TPU cache.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, _repo)
