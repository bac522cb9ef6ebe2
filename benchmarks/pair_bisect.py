"""Bisect the pair-batched front-end on the real chip.

Round-3 finding: the never-hardware-measured pair program benched 44.3 ms
against the 14.9 ms two-sequential-calls split from round 2.  This script
times each pair-program stage in isolation (scan differencing, so numbers
are pure device time) to locate the regression.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from akaze_tpu import AkazeConfig
from akaze_tpu.io import load_pgm
from akaze_tpu.plan import build_plan
from akaze_tpu.pipeline import detect_and_compute, detect_and_compute_pair
from akaze_tpu.scale_space import build_scale_space
from akaze_tpu.detect import detect_keypoints
from akaze_tpu.descriptor import WSIZE, orient_describe_pallas_multi
from akaze_tpu.detect import build_padded_pyramid
from akaze_tpu.profiling import scan_time

left = load_pgm("/root/reference/data/left.pgm")
right = load_pgm("/root/reference/data/right.pgm")
a = jnp.asarray(left.astype(np.float32) / 255.0)
b = jnp.asarray(right.astype(np.float32) / 255.0)
cfg = AkazeConfig(max_pts=10000)
plan = build_plan(*left.shape, cfg)


def t(name, fn, *args):
    ms = scan_time(fn, *args) * 1000
    print(f"{name:34s}: {ms:.2f} ms", flush=True)
    return ms


# 0. two sequential single-image programs (round-2 formulation)
def seq_pair(a, b):
    fa = detect_and_compute(a, plan)
    fb = detect_and_compute(b, plan)
    return fa.words.sum() + fb.words.sum() + fa.x.sum() + fb.x.sum()

t("2x sequential detect+describe", seq_pair, a, b)


# 1. full pair program
def pairp(a, b):
    fa, fb = detect_and_compute_pair(a, b, plan)
    return fa.words.sum() + fb.words.sum() + fa.x.sum() + fb.x.sum()

t("pair-batched detect+describe", pairp, a, b)


# 2. batched scale space alone
def ss_pair(a, b):
    octs, _ = build_scale_space(jnp.stack([a, b]), plan, False)
    return sum(o.det.sum() + o.L.sum() for o in octs)

t("batched scale space", ss_pair, a, b)


def ss_one(a):
    octs, _ = build_scale_space(a, plan, False)
    return sum(o.det.sum() + o.L.sum() for o in octs)

t("single scale space", ss_one, a)


# 3. detection on batched octaves.  NOTE: the vmapped form measured
# 34.2 ms/pair on v5e (batched top_k / 4D transposes / batched gathers)
# against 2x1.8 ms for the unbatched program — the reason
# detect_and_compute_pair unstacks before detecting.
def det_pair(a, b):
    octs, _ = build_scale_space(jnp.stack([a, b]), plan, False)
    kps_a = detect_keypoints(jax.tree.map(lambda x: x[0], octs), plan, False)
    kps_b = detect_keypoints(jax.tree.map(lambda x: x[1], octs), plan, False)
    return (kps_a.x.sum() + kps_a.response.sum()
            + kps_b.x.sum() + kps_b.response.sum())

t("batched ss + 2x unbatched detect", det_pair, a, b)


def det_one(a):
    octs, _ = build_scale_space(a, plan, False)
    kps = detect_keypoints(octs, plan, False)
    return kps.x.sum() + kps.y.sum() + kps.response.sum()

t("single ss + detect", det_one, a)


# 4. pair descriptor alone (on precomputed detections)
def desc_pair(a, b):
    octs_pair, _ = build_scale_space(jnp.stack([a, b]), plan, False)
    octs_a = jax.tree.map(lambda x: x[0], octs_pair)
    octs_b = jax.tree.map(lambda x: x[1], octs_pair)
    kps_a = detect_keypoints(octs_a, plan, False)
    kps_b = detect_keypoints(octs_b, plan, False)
    pp = build_padded_pyramid(octs_a + octs_b, WSIZE, dtype=jnp.bfloat16,
                              extra=(8, 128))
    (ang_a, d_a), (ang_b, d_b) = orient_describe_pallas_multi(
        [kps_a, kps_b], pp, plan, slack=(8, 128))
    return d_a.words.sum() + d_b.words.sum() + ang_a.sum() + ang_b.sum()

t("pair detect + pair descriptor", desc_pair, a, b)
