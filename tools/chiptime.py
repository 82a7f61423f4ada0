"""Trustworthy on-chip timing through the axon tunnel.

Measured facts about this backend (r5, /tmp calib scripts):

  * `jax.block_until_ready` is a NO-OP for plain XLA executables — a 1 GiB
    multiply and an 8k^3 matmul both "complete" in 0.03 ms. Only programs
    containing Pallas kernels block for real. Every timing loop that relies
    on block_until_ready for non-pallas programs measures enqueue, not
    compute (this invalidated the r4 per-stage *standalone* numbers; the
    full-frame and prefix-delta numbers cross-check against per-call
    fetch-synced timing and stand).
  * The only airtight sync is a DATA FETCH (float()/np.asarray). Round-trip
    latency ~27 ms, jitter +-3 ms.
  * Fetching a value that depends on a deep queue of pending executions can
    stall the relay for minutes — never queue-then-fetch.

Protocol: replicate the computation k times INSIDE one jitted program with
a lax.scan whose carry perturbs the input and consumes the output (forces k
serial evaluations, defeats CSE/hoisting), fetch-sync each call, and report
(t_k - t_0) / k where t_0 is the same program at k=0 (scan of length 0 —
same executable shape, pure latency + fixed overhead). Cost: 2 compiles per
candidate; precision ~ +-(jitter / k) ~ +-0.2 ms at k=16.
"""
from __future__ import annotations

import time

import numpy as np


def _fetch(x) -> float:
    return float(np.asarray(x).ravel()[0])


def measure_scan(make_body, k: int = 16, n: int = 5, warmup: int = 1,
                 k0: int = 1):
    """Time one iteration of `make_body`.

    make_body: () -> (fn, args) where fn(carry: f32[], *args) -> f32[] —
    a scalar-to-scalar step closing over the real workload; it MUST fold
    `carry` into the computation's inputs (e.g. `x + carry * 1e-30`) and
    return a scalar derived from its outputs (e.g. `jnp.sum(out) * 1e-30`)
    so the scan chain is serial and nothing hoists.

    Returns (ms_per_iter, details dict).
    """
    import jax
    import jax.numpy as jnp

    fn, args = make_body()

    def repk(kk):
        @jax.jit
        def run(*a):
            def body(c, _):
                return fn(c, *a), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=kk)
            return c
        return run

    times = {}
    for kk in (k0, k):
        r = repk(kk)
        _fetch(r(*args))                      # compile + settle
        for _ in range(warmup):
            _fetch(r(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _fetch(r(*args))
            ts.append(time.perf_counter() - t0)
        times[kk] = float(np.median(ts)) * 1e3
    ms = (times[k] - times[k0]) / (k - k0)
    return ms, {"t_k": times[k], "t_k0": times[k0], "k": k, "k0": k0}


def measure_fetch(fn, *args, n: int = 7, warmup: int = 2):
    """Per-call fetch-synced timing (latency INCLUDED, ~27 ms): median of n
    calls of fn(*args) each synced by fetching one scalar from the output.
    Use for ~10 ms+ programs; subtract a null-jit latency for absolute cost.
    """
    import jax
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return _fetch(leaf if leaf.ndim == 0 else leaf.ravel()[0:1])

    out = fn(*args)
    sync(out)
    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def null_latency(n: int = 9) -> float:
    """Round-trip latency of a trivial jit, fetch-synced."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    return measure_fetch(f, x, n=n)
