"""Test configuration: force JAX onto the CPU backend with 8 fake devices so
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4 item 4).

Note: this machine's axon sitecustomize calls jax.config.update(
"jax_platforms", "axon,cpu") at interpreter start, so env vars alone are NOT
enough — the config must be overridden after import, before first backend use.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
