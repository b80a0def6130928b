"""Test harness config: force an 8-device virtual CPU mesh before JAX import.

Multi-device sharding logic (gather -> advantage -> slice, pjit train steps) is
exercised on a host-platform mesh, per the TPU-less CI strategy in SURVEY.md §4.
"""

import os

# FORCE cpu: the build VM exports JAX_PLATFORMS=axon globally AND its
# sitecustomize imports jax at interpreter startup, so the env default is
# already baked into jax.config by the time conftest runs — update both.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert all(d.platform == "cpu" for d in jax.devices()), (
    "tests must run on the virtual CPU mesh, got: " + str(jax.devices()))
assert len(jax.devices()) == 8, jax.devices()
