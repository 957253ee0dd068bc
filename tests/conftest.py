"""Test harness: run everything on a virtual 8-device CPU mesh.

CI needs no TPU: JAX's CPU backend executes the same XLA graphs, and the
forced 8-device host platform exercises the sharding/pjit paths exactly as
an 8-chip slice would (minus the ICI).
"""

import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite's cost is dominated by CPU
# compiles of the fused/batched graphs (~30-90 s each); keyed on the HLO
# hash, so stale entries are impossible and repeat runs skip straight to
# execution. Safe to delete the directory at any time.
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Make the repo root (package) and tests dir (shared synth helpers)
# importable when running from a source checkout.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
