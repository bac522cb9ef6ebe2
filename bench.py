"""Headline benchmark: the reference's stock matching test on one TPU chip.

Protocol (BASELINE.md): detect + describe BOTH images of the stock pair and
brute-force Hamming match, averaged over repeats, against the reference's
19.56 ms on a GTX 1080 (README.md:15).

Two environment quirks make naive timing lie (see benchmarks/prof_utils.py):
executions whose outputs aren't fetched can be dropped, and each dispatch
pays a large relay round trip.  So the repeats run *inside one jitted
program* as a lax.scan with a serial data dependence, and we difference two
repeat counts to cancel the constant dispatch cost — this measures pure
on-device pipeline time, which is also how a production deployment would run
(batched, device-resident).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MS = 19.56


def main():
    import os
    import jax
    import jax.numpy as jnp
    # persistent compile cache: the banded Pallas kernels make a cold
    # compile of the two scan programs take minutes; cache across runs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(
                          __file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from akaze_tpu import AkazeConfig
    from akaze_tpu.io import load_pgm
    from akaze_tpu.match import match
    from akaze_tpu.pipeline import detect_and_compute_pair
    from akaze_tpu.plan import build_plan

    left = load_pgm("/root/reference/data/left.pgm")
    right = load_pgm("/root/reference/data/right.pgm")
    l_img = jnp.asarray(left.astype(np.float32) / 255.0)
    r_img = jnp.asarray(right.astype(np.float32) / 255.0)
    h, w = left.shape
    cfg = AkazeConfig(max_pts=10000)
    plan = build_plan(h, w, cfg)

    def make_run(n):
        @jax.jit
        def run(a, b):
            def body(carry, _):
                # pair-batched: one vmapped detect + one fused descriptor
                # launch over both images (reference protocol processes the
                # pair per iteration, main.cpp:199-216)
                f1, f2 = detect_and_compute_pair(a + carry * 1e-30,
                                                 b + carry * 1e-30, plan)
                m = match(f1.words, f1.valid, f2.words, f2.valid, f2.x, f2.y,
                          cfg.max_dist)
                return carry + m.distance[0] * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return run

    timings = {}
    for n in (4, 24):
        run = make_run(n)
        float(run(l_img, r_img))  # compile + warm
        best = float("inf")
        for _ in range(2):
            t = time.time()
            float(run(l_img, r_img))
            best = min(best, time.time() - t)
        timings[n] = best
    per_iter_ms = (timings[24] - timings[4]) / 20 * 1000

    print(json.dumps({
        "metric": "detect+describe+match, stock pair (960x1280), per iteration",
        "value": round(per_iter_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / per_iter_ms, 3),
    }))


if __name__ == "__main__":
    main()
