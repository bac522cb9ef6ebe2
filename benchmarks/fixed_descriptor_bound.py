"""Measured deviation bound for the fixed-point ("fastakaze") descriptor
on the Pallas path.

The TPU default routes the fixed pipeline's descriptor sampling through
the bf16 *float* Pallas kernel (pipeline.py), which skips the reference's
per-sample int truncation (akazed.cu:3779-3780).  The XLA fallback
(``pallas_descriptor='off'``) is bit-faithful.  This harness quantifies
what the substitution costs at full resolution: per-descriptor bit flips
between the two paths and the deviation of the resulting match sets.

Run on the TPU chip: python benchmarks/fixed_descriptor_bound.py
Prints one JSON line; numbers are recorded in BENCH_NOTES.md and pinned
by tests/test_pallas_descriptor.py's fixed-path bound test.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def compare(left, right, mode_a="off", mode_b="auto", max_pts=6000):
    from akaze_tpu import Akaze, AkazeConfig

    out = {}
    feats = {}
    for tag, mode in (("faithful", mode_a), ("pallas", mode_b)):
        det = Akaze(AkazeConfig(max_pts=max_pts, pallas_descriptor=mode),
                    fixed=True)
        fa = det.detect_and_compute(left)
        fb = det.detect_and_compute(right)
        m = det.match(fa, fb)
        feats[tag] = (fa, fb, m)

    fa0, fb0, m0 = feats["faithful"]
    fa1, fb1, m1 = feats["pallas"]
    n = int(fa0.count)
    assert int(fa1.count) == n, "detection must be identical"

    def bitflips(w0, w1, n):
        b0 = np.unpackbits(np.ascontiguousarray(
            np.asarray(w0)[:n]).view(np.uint8), axis=1)
        b1 = np.unpackbits(np.ascontiguousarray(
            np.asarray(w1)[:n]).view(np.uint8), axis=1)
        d = (b0 != b1).sum(axis=1)
        return d

    d = bitflips(fa0.words, fa1.words, n)
    i0 = np.asarray(m0.index)[:n]
    i1 = np.asarray(m1.index)[:n]
    agree = (i0 == i1).mean()
    acc0 = (i0 >= 0).sum()
    acc1 = (i1 >= 0).sum()
    out = {
        "metric": "fixed-path Pallas descriptor deviation (vs bit-faithful XLA)",
        "keypoints": n,
        "bitflips_mean": round(float(d.mean()), 3),
        "bitflips_p99": int(np.percentile(d, 99)),
        "bitflips_max": int(d.max()),
        "match_index_agreement": round(float(agree), 4),
        "accepted_faithful": int(acc0),
        "accepted_pallas": int(acc1),
    }
    print(json.dumps(out))
    return out


def main():
    from akaze_tpu.io import load_pgm
    left = load_pgm("/root/reference/data/left.pgm")
    right = load_pgm("/root/reference/data/right.pgm")
    return compare(left, right)


if __name__ == "__main__":
    main()
