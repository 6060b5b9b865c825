"""Shared pipelined device-timing harness for the scripts/exp_*.py probes.

Methodology (NOTES.md "Device/runtime facts"): this device sits behind a
relay with ~30 ms per *synchronized* dispatch, so per-call timing measures
the relay, not the program. Every probe therefore runs its whole iteration
loop ON DEVICE via lax.scan, threads a scalar carry into the inputs (a real
data dependence, so XLA cannot hoist the body out of the loop) and fetches
ONE scalar at the end — the only sync point.
"""

from __future__ import annotations

import time


def pipelined_timer(fn, xs, iters: int = 20):
    """Time `fn(*xs) -> array` over `iters` on-device iterations.

    The carry is injected as `x + carry * 1e-30` into every non-bool input —
    value-neutral for floats, a traced (unfoldable) zero for ints — and
    advanced with one element of the output, ordering the stream without
    changing the math. Returns seconds per iteration (after one full
    compile+run warmup; the warmup carry is checked finite so an inf/NaN
    output cannot silently poison the timed inputs).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def inject(x, c):
        if not hasattr(x, "dtype") or x.dtype == jnp.bool_:
            return x
        # float: +c*1e-30 (value-neutral); int: +int(c*1e-30) — a traced
        # zero XLA cannot fold, preserving the loop-carried dependence.
        return x + (c * 1e-30).astype(x.dtype)

    @jax.jit
    def run(*xs):
        def body(c, _):
            out = fn(*(inject(x, c) for x in xs))
            return c + out.astype(jnp.float32).ravel()[0], ()

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)
        return c

    warm = float(run(*xs))  # warmup = compile + one full timed-shape run
    assert np.isfinite(warm), f"non-finite checksum from timed fn: {warm}"
    t0 = time.perf_counter()
    float(run(*xs))
    return (time.perf_counter() - t0) / iters
