"""Test configuration: force JAX onto the CPU backend with 8 fake devices so
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4 item 4).

Note: this machine's axon sitecustomize calls jax.config.update(
"jax_platforms", "axon,cpu") at interpreter start, so env vars alone are NOT
enough — the config must be overridden after import, before first backend use.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: repeated suite runs skip the multi-minute
# CPU-XLA compiles (VERDICT r1 weak #9). Safe to delete at any time.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
# Cache EVERYTHING: suite time is dominated by hundreds of small eager-op
# and medium jit compiles (10-300 ms each) that a 1 s write threshold never
# persists — with 0.0 the second run loads them all from disk.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
