"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-world analog of a fake backend (SURVEY.md §4): sharding,
collectives and pjit compile+execute on 8 host-platform devices without TPU
hardware.

Note: the environment's axon sitecustomize force-registers the TPU plugin and
sets jax_platforms='axon,cpu' at interpreter start, so the JAX_PLATFORMS env
var alone is NOT enough — we must override via jax.config after import (but
before any backend initializes). XLA_FLAGS must be set before jax import.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
