"""Test configuration: force the JAX CPU backend with 8 virtual devices so
distributed (mesh/sharding) logic is testable without a TPU pod — the
substitute for the fake backends the reference lacks (SURVEY.md §4).

Must run before any `import jax` in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS, so
# pin the platform through jax.config too (must happen before any computation).
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
