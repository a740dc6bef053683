"""Test-session environment: force CPU JAX with 8 virtual devices.

Multi-chip sharding is validated on a simulated 8-device CPU mesh
(SURVEY.md section 4: "Multi-chip without a cluster"). The environment
pins jax_platforms to the axon TPU tunnel regardless of JAX_PLATFORMS, so
the override must go through jax.config before the backend initializes -
which is why this lives in the root conftest, imported before any test
module touches jax.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
