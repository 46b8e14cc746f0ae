"""Test configuration: force an 8-device virtual CPU platform so sharding /
pjit paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must run before any jax backend is initialised. The ambient environment
# registers a hardware TPU platform via sitecustomize and pins
# JAX_PLATFORMS, so the env var alone is not enough — override the config
# directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
import pathlib

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
