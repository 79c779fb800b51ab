"""Test harness config: force CPU with 8 virtual devices for sharding tests.

The environment registers an 'axon' TPU backend from sitecustomize at
interpreter startup and sets jax_platforms='axon,cpu', which would make the
test suite claim the (single, tunneled) TPU chip. Tests must run on CPU with a
virtual 8-device mesh, so override the platform via the config API (which
wins over the registration as long as no backend has initialized yet) and
force the host device count before first backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
