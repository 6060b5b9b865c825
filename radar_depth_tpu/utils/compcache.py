"""Persistent XLA compilation cache for entry points.

On this machine the TPU sits behind a relay and a full model compile costs
minutes; every CLI invocation (train, eval, bench, serve) used to pay it
again even for graphs identical to the previous process's. JAX's persistent
compilation cache serializes compiled executables to disk and reloads them
across processes — measured on the axon backend: second-process first-call
latency 1.95s -> 0.50s on a toy graph, and it is the multi-minute model
compiles that dominate eval/train startup here.

The reference has no analogue (PyTorch eager recompiles nothing;
upstream:main.py). This is infrastructure the TPU/XLA compilation model
makes necessary.

Entry points call :func:`enable_persistent_cache` explicitly. It is NOT
done at package import: tests/conftest.py configures its own isolated
cache dir, and library imports must not mutate global jax config.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/radar_depth_tpu/xla")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    ``cache_dir`` defaults to ``$RDTP_XLA_CACHE_DIR`` or
    ``~/.cache/radar_depth_tpu/xla``. Setting ``RDTP_XLA_CACHE_DIR=0`` (or
    ``none``/empty) disables caching. Returns the directory used, or None
    when disabled. Safe to call more than once; must be called before the
    first compilation to take effect for it.
    """
    env = os.environ.get("RDTP_XLA_CACHE_DIR")
    if env is not None and env.strip().lower() in ("", "0", "none", "off"):
        return None
    path = cache_dir or env or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: on the relay even sub-second compiles add up across
    # the dozens of helper jits a run traces (jax's defaults skip small
    # entries, tuned for fast local compiles).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
