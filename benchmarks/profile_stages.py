"""Per-stage timing of the AKAZE pipeline on the current backend.

Uses the scan-differencing protocol from prof_utils (honest device time,
dispatch overhead cancelled).  Run on the real TPU chip:

    python benchmarks/profile_stages.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

# fallback when akaze_tpu is not pip-installed: repo root + this dir
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from akaze_tpu import AkazeConfig
from akaze_tpu.io import load_pgm
from akaze_tpu.plan import build_plan
from akaze_tpu.scale_space import build_scale_space
from akaze_tpu.detect import (build_extrema_maps, nms, select_keypoints,
                              flatten_pyramid, refine_keypoints,
                              build_padded_pyramid, detect_keypoints)
from akaze_tpu.descriptor import (WSIZE, extract_windows, compute_orientation,
                                  compute_descriptors)
from akaze_tpu.match import match
from akaze_tpu.pipeline import detect_and_compute
from prof_utils import report
from akaze_tpu.profiling import enable_compile_cache

enable_compile_cache()


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    left = load_pgm("/root/reference/data/left.pgm")
    img = jnp.asarray(left.astype(np.float32) / 255.0)
    h, w = img.shape
    cfg = AkazeConfig(max_pts=10000)
    plan = build_plan(h, w, cfg)
    print(f"image {h}x{w}, octaves={len(plan.octaves)}")

    # --- stage 1: scale space ---
    def ss(im):
        octs, kc = build_scale_space(im, plan)
        return sum(jnp.sum(o.det[:, ::64, ::64]) for o in octs) + kc

    report("scale_space          ", ss, img)

    # precompute inputs for later stages
    octaves, _ = build_scale_space(img, plan)
    octaves = jax.tree.map(jax.device_put, octaves)

    def extrema(d0, rest):
        octs = [type(octaves[0])(*[jnp.where(i == 0 and k == 0, v + d0 * 0, v)
                                   for k, v in enumerate(o)])
                for i, o in enumerate(rest)]
        r, s, l = build_extrema_maps(octs, plan)
        return jnp.sum(r[::64, ::64]) + jnp.sum(s[::64, ::64])

    def extrema_fn(dummy):
        r, s, l = build_extrema_maps(
            [o._replace(det=o.det + dummy * 0) for o in octaves], plan)
        return jnp.sum(r[::64, ::64])

    report("extrema_maps         ", extrema_fn, jnp.float32(0))

    resp, size, layer = jax.jit(
        lambda: build_extrema_maps(octaves, plan))()

    def nms_fn(r):
        m = nms(r, size, layer, plan)
        return jnp.sum(m.astype(jnp.float32)[::16, ::16])

    report("nms                  ", nms_fn, resp)

    mask = jax.jit(lambda: nms(resp, size, layer, plan))()

    def select_fn(r):
        kps = select_keypoints(mask, r, size, layer, cfg.max_pts)
        return jnp.sum(kps.x) + kps.count.astype(jnp.float32)

    report("select               ", select_fn, resp)

    kps = jax.jit(lambda: select_keypoints(mask, resp, size, layer,
                                           cfg.max_pts))()
    print(f"  count = {int(kps.count)}")

    def refine_fn(r):
        octs = [o._replace(det=o.det + r[0, 0] * 0) for o in octaves]
        flat = flatten_pyramid(octs)
        k2 = refine_keypoints(kps, flat, plan)
        return jnp.sum(k2.x)

    report("flatten+refine       ", refine_fn, resp)

    pp = jax.jit(lambda: build_padded_pyramid(octaves, WSIZE))()

    def wnd_fn(Lp):
        w2 = extract_windows(kps, pp._replace(L=Lp), plan)
        return jnp.sum(w2.L[:, ::32, ::32])

    report("extract_windows      ", wnd_fn, pp.L)

    wnd = jax.jit(lambda: extract_windows(kps, pp, plan))()

    def orient_fn(lx):
        a = compute_orientation(kps, wnd._replace(lx=lx), plan)
        return jnp.sum(a)

    report("orientation          ", orient_fn, wnd.lx)

    angle = jax.jit(lambda: compute_orientation(kps, wnd, plan))()

    def desc_fn(L):
        d = compute_descriptors(kps, angle, wnd._replace(L=L), plan)
        return jnp.sum(d.words[:, 0].astype(jnp.float32))

    report("descriptors          ", desc_fn, wnd.L)

    feats = jax.jit(lambda im: detect_and_compute(im, plan))(img)

    def match_fn(w1):
        m = match(w1.astype(jnp.uint32), feats.valid, feats.words,
                  feats.valid, feats.x, feats.y, cfg.max_dist)
        return jnp.sum(m.distance)

    report("match (self)         ", match_fn, feats.words)

    def full_fn(im):
        f = detect_and_compute(im, plan)
        return jnp.sum(f.x) + jnp.sum(f.words[:, 0].astype(jnp.float32))

    report("FULL detect+describe ", full_fn, img)


if __name__ == "__main__":
    main()
