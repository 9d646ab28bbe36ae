"""Test configuration.

Tests run on CPU with a simulated 8-device mesh (SURVEY.md §5: distributed
behavior is tested with local stand-ins — the TPU analog of the reference's
localhost-ZMQ multi-process tests). Sharding-semantics tests therefore run
anywhere; real-chip performance is measured by bench.py, not the test suite.

The ambient environment force-registers the axon TPU backend via
sitecustomize and overrides JAX_PLATFORMS, so we override back after import:
jax.config.update("jax_platforms", "cpu") — this runs before any backend is
initialized, so XLA_FLAGS still takes effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
