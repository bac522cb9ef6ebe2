"""A/B profile of the scale-banded descriptor dispatch (TPU).

Times orient_describe_pallas (host-side band sort + banded kernels) on the
stock pair's real keypoints under different band tables, to attribute the
banding win/loss directly.  Usage: python benchmarks/band_profile.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from akaze_tpu import AkazeConfig
    from akaze_tpu import descriptor as D
    from akaze_tpu.detect import detect_keypoints, build_padded_pyramid
    from akaze_tpu.io import load_pgm
    from akaze_tpu.plan import build_plan
    from akaze_tpu.profiling import scan_time
    from akaze_tpu.scale_space import build_scale_space

    left = load_pgm("/root/reference/data/left.pgm")
    img = jnp.asarray(left.astype(np.float32) / 255.0)
    cfg = AkazeConfig(max_pts=10000)
    plan = build_plan(*left.shape, cfg)
    octaves, _ = build_scale_space(img, plan)
    kps = detect_keypoints(octaves, plan)
    pp = build_padded_pyramid(octaves, D.WSIZE, dtype=jnp.bfloat16)
    jax.block_until_ready(pp.L)
    print(f"keypoints: {int(kps.count)}")

    VARIANTS = {
        "single-128": ((10 ** 9, 128, 256, 120, 128),),
        "bands-72/104/128": ((2, 72, 256, 64, 64), (3, 104, 256, 96, 96),
                             (10 ** 9, 128, 256, 120, 128)),
        "bands-80/112/128": ((2, 80, 256, 64, 64), (3, 112, 256, 96, 96),
                             (10 ** 9, 128, 256, 120, 128)),
        "bands-2x-72/128": ((2, 72, 256, 64, 64),
                            (10 ** 9, 128, 256, 120, 128)),
    }
    saved = D._SCALE_BANDS
    for name, bands in VARIANTS.items():
        D._SCALE_BANDS = bands

        def fn(kx, ky, L):
            kps2 = kps._replace(x=kx, y=ky)
            pp2 = pp._replace(L=L)
            ang, desc = D.orient_describe_pallas(kps2, pp2, plan)
            return ang[0] + desc.words[0, 0].astype(jnp.float32)

        dt = scan_time(fn, kps.x, kps.y, pp.L, n1=2, n2=12)
        print(f"{name:>20}: {dt * 1000:.3f} ms")
    D._SCALE_BANDS = saved


def parts_split():
    """orient vs desc split of the fused kernel (single band)."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from akaze_tpu import AkazeConfig
    from akaze_tpu import descriptor as D
    from akaze_tpu.detect import detect_keypoints, build_padded_pyramid
    from akaze_tpu.io import load_pgm
    from akaze_tpu.plan import build_plan
    from akaze_tpu.profiling import scan_time
    from akaze_tpu.scale_space import build_scale_space
    from akaze_tpu.ops.pallas_describe import orient_describe

    left = load_pgm("/root/reference/data/left.pgm")
    img = jnp.asarray(left.astype(np.float32) / 255.0)
    cfg = AkazeConfig(max_pts=10000)
    plan = build_plan(*left.shape, cfg)
    octaves, _ = build_scale_space(img, plan)
    kps = detect_keypoints(octaves, plan)
    pp = build_padded_pyramid(octaves, D.WSIZE, dtype=jnp.bfloat16)
    print(f"keypoints: {int(kps.count)}")

    # build single-band params exactly like the fast path
    ms = cfg.max_scale
    n = kps.x.shape[0]
    p = jnp.clip(kps.layer, 0, pp.L.shape[0] - 1)
    o = jnp.maximum(kps.layer // ms, 0)
    iratio = 1.0 / (1 << o).astype(jnp.float32)
    xc = (kps.x * iratio + 0.5).astype(jnp.int32)
    yc = (kps.y * iratio + 0.5).astype(jnp.int32)
    wo = pp.widths[p]
    ho = pp.heights[p]
    x0 = jnp.clip(xc - 64, 0, jnp.maximum(wo - 128, 0))
    y0 = jnp.clip(yc - 60, 0, jnp.maximum(ho - 120, 0))
    xi = (kps.x + 0.5).astype(jnp.int32) >> o
    yi = (kps.y + 0.5).astype(jnp.int32) >> o
    isc = (kps.size + 0.5).astype(jnp.int32)
    ip = jnp.stack([p, y0, x0, yi - y0, xi - x0, isc,
                    kps.valid.astype(jnp.int32),
                    jnp.zeros_like(p)], axis=1)
    fp = jnp.stack([kps.y * iratio - y0.astype(jnp.float32),
                    kps.x * iratio - x0.astype(jnp.float32),
                    isc.astype(jnp.float32), jnp.zeros_like(kps.x)], axis=1)
    kb = 24
    rem = (-n) % kb
    if rem:
        ip = jnp.pad(ip, ((0, rem), (0, 0)))
        fp = jnp.pad(fp, ((0, rem), (0, 0)))
    pyramid = D._padded_band_pyramid(pp, 128, 256)

    for parts in ("both", "orient", "desc"):
        def fn(fp_in, ip_in, pyr):
            ang, acc = orient_describe(ip_in, fp_in, pyr, kb=kb,
                                       parts=parts)
            return ang[0] + acc[0, 0]

        dt = scan_time(fn, fp.reshape(-1), ip.reshape(-1), pyramid,
                       n1=2, n2=12)
        print(f"parts={parts:>7}: {dt * 1000:.3f} ms")


if __name__ == "__main__":
    import sys as _s
    if "--parts" in _s.argv:
        parts_split()
    else:
        main()
