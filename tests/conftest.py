"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated without TPU hardware by spoofing the
XLA host-platform device count (the strategy SURVEY.md section 4
prescribes in place of the reference's nonexistent multi-node tests).

Note: a sitecustomize module may import jax at interpreter startup
(latching any env-var platform choice before this file runs), so the
platform is forced through ``jax.config.update`` as well - that path
works post-import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
