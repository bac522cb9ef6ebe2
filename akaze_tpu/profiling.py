"""Timing utilities that survive this environment's TPU relay quirks.

Two relay behaviors break naive benchmarking here:
  * executions whose outputs are never fetched can be dropped entirely
    (``block_until_ready`` returns without forcing work);
  * every eager op / program dispatch pays a large (~100ms+) round-trip.

The honest protocol (the package's analogue of the reference's CUDA-event
timers, cuda_utils.h safeCall/timer pattern): run the function N times
*inside one jitted program* with a serial data dependence, fetch the scalar
result, and difference two values of N to cancel dispatch overhead.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def enable_compile_cache(path=None):
    """Persistent compilation cache (first compiles of the benchmark scan
    programs take minutes; cache them across runs)."""
    import os
    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def scan_time(fn, *args, n1: int = 2, n2: int = 12, trials: int = 1):
    """Per-iteration seconds of ``fn(*args) -> scalar`` measured in-graph.

    ``fn`` must return a scalar that depends on the work to be timed; its
    first argument is perturbed by the carried scalar to serialise
    iterations.
    """
    def make(n):
        @jax.jit
        def run(*a):
            def body(c, _):
                # dynamic (value-zero) perturbation defeats loop-invariant
                # code motion without changing the computed values
                first = a[0] + (c * 1e-30).astype(a[0].dtype)
                return c + fn(first, *a[1:]).astype(jnp.float32) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return run

    # difference of per-n minima (not min of per-trial differences, which
    # is biased negative under dispatch jitter: any trial pairing a slow
    # n1 dispatch with a fast n2 dispatch yields a spuriously small — even
    # negative — difference, and min() then selects exactly those)
    best = {}
    runs = {n: make(n) for n in (n1, n2)}
    for n in (n1, n2):
        float(runs[n](*args))  # compile + warm
    for _ in range(trials):
        for n in (n1, n2):
            t = time.time()
            float(runs[n](*args))
            dt = time.time() - t
            best[n] = min(best.get(n, dt), dt)
    return (best[n2] - best[n1]) / (n2 - n1)


def report(name, fn, *args, **kw):
    dt = scan_time(fn, *args, **kw)
    print(f"{name}: {dt * 1000:.2f} ms")
    return dt
