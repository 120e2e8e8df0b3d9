"""Device-time measurement that survives remote/tunneled PJRT backends.

Naive `block_until_ready` timing is useless through a remote tunnel (dispatch
RTT dominates and readiness can be reported early; this environment's 'axon'
tunnel shows both). `device_time_per_iter` runs the function `iters` times
inside ONE jitted lax.fori_loop with a genuine loop-carried value dependency
(so XLA can neither hoist the body as loop-invariant nor DCE it), dispatches
once, fetches one scalar, and divides. RTT amortizes away.

The feedback perturbs the first argument's VALUES (adds the parity bit of the
previous output), which is fine for every kernel here: alignment/pileup
kernels are data-independent in cost (static shapes, no data-dependent
control flow), so throughput is unaffected.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def device_time_per_iter(fn: Callable, args: tuple, iters: int = 32) -> float:
    """Seconds per call of `fn(*args)` measured on device (cost must be
    data-independent; values of args[0] are perturbed between iterations)."""

    def run(n, *a):
        def body(_, carry):
            a0, feed = carry
            out = fn(a0, *a[1:])
            lead = out[0] if isinstance(out, (tuple, list)) else out
            s = (jnp.sum(lead.astype(jnp.int32)) & 1).astype(a0.dtype)
            return a0 + s, feed + s.astype(jnp.int32)

        _, feed = jax.lax.fori_loop(0, n, body, (a[0], jnp.int32(0)))
        return feed

    runner = jax.jit(run, static_argnums=0)
    np.asarray(runner(2, *args))          # compile + warm overhead variant
    np.asarray(runner(2 + iters, *args))  # compile + warm measured variant
    t0 = time.time()
    np.asarray(runner(2 + iters, *args))
    t1 = time.time()
    t2 = time.time()
    np.asarray(runner(2, *args))  # overhead-only run (RTT + 2 iters)
    t3 = time.time()
    return max((t1 - t0) - (t3 - t2), 1e-9) / iters
