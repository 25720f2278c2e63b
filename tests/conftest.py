"""Force an 8-device virtual CPU mesh for all tests.

This is the TPU build's analogue of the reference's
2-processes-per-GPU multi-"host" emulation (SURVEY.md §4): JAX lets a
single process fake N devices on CPU, so distributed code paths
(shard_map, all_to_all, pjit) are exercised in CI without hardware.

NOTE: the environment pins JAX_PLATFORMS=axon (the remote-TPU tunnel),
which ignores the env-var override — ``jax.config.update`` is the only
reliable way to force the CPU backend, and it must run before any
device query.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
