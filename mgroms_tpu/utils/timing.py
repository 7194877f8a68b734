"""Reliable device timing for remote-attached TPU backends.

On tunneled backends (axon), ``block_until_ready`` can return before the
device work completes and per-call host dispatch adds a large RTT, so the
only trustworthy measurement is: run the workload N times inside a single
on-device ``fori_loop``, force completion with a scalar device-to-host
fetch, and subtract the 1-iteration run (which carries the same RTT +
fetch overhead).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def time_device_fn(step: Callable, carry, iters: int = 20,
                   warmup: bool = True) -> float:
    """Seconds per application of ``step`` (carry -> carry), measured
    device-resident.  ``step`` must be jit-compatible and its output
    pytree structure must match its input."""

    @jax.jit
    def loop(carry, n):
        # dynamic trip count: one compilation serves every n
        out = jax.lax.fori_loop(0, n, lambda i, c: step(c), carry)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                   for leaf in leaves)

    n1 = jnp.int32(1)
    nN = jnp.int32(iters + 1)
    if warmup:
        float(loop(carry, n1))
        float(loop(carry, nN))
    t0 = time.perf_counter()
    float(loop(carry, n1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(carry, nN))
    t2 = time.perf_counter() - t0
    return max((t2 - t1) / iters, 0.0)
