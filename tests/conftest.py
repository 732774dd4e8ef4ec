"""Test config: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (the standard fake-pod setup, see SURVEY.md §4).

The container pins ``JAX_PLATFORMS=axon`` (a tunnelled single real TPU chip)
for every interpreter via sitecustomize; tests must NOT use it — remote
compiles take tens of seconds each and there is only one chip. Force the
CPU platform and 8 virtual devices before any jax backend initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already with platforms=axon baked into
# the config; override at the config level too so backend selection sees cpu.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got: %r" % (jax.devices(),))
assert len(jax.devices()) == 8
