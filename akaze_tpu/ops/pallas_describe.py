"""Fused Pallas TPU kernel: per-keypoint orientation + MLDB cell sums.

Replaces the XLA path of descriptor.py (extract_windows +
compute_orientation + the sampling half of compute_descriptors) for the
float pipeline.  The XLA formulation materialises [N, 441, 128] one-hot
tensors in HBM (~2.3 GB of pure selection traffic at N = 10k) and extracts
2 GB of per-keypoint windows with vmapped dynamic slices; this kernel keeps
everything on-chip:

  grid = (N/KB,) keypoint blocks; per step it
    1. DMAs the KB keypoints' [W, W] windows (L, Lx, Ly, bf16) HBM -> VMEM,
       double-buffered against compute (the next block's windows stream in
       while the current block computes);
    2. samples the 11x11 orientation disc with a one-hot matmul, forms the
       42-bin histogram on the MXU, scans the 7-bin circular window with a
       constant [48, 48] band matrix, and takes the first maximum
       (gCalcOrient semantics, akazed.cu:1665-1736);
    3. samples the 441 rotated descriptor taps with one [448, W] one-hot
       matmul per plane and reduces straight to the 29 MLDB cell sums with
       a constant membership matrix (gDescribe2, akazed.cu:1869-2001) —
       individual samples never leave VMEM;
    4. rotates the derivative cell sums by the found angle (rotation is
       linear, so it commutes with the cell sums on the float path).

Outputs: angle [N] and cell accumulators [N, 96] (= [29 cells x 3 channels]
at lanes cell*3+chan, matching descriptor._compare_matrices).  The 486
pairwise comparisons + bit packing stay in XLA (one tiny matmul).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import descriptor as _d

WSIZE = _d.WSIZE          # 128: logical window (covers max sampling radius)
# The DMA'd window covers the logical sampling region plus tile-alignment
# slack: HBM slices of a (8, 128)-tiled bf16 memref must start at
# tile-aligned offsets, so the origin is rounded down to the tile grid.
# The y window is 120 logical rows (sampling radius <= 59 around a center
# placed at row 60..67) + <8 rows of alignment slack = exactly 128 — an
# MXU-native contraction size (136 padded to 256 and halved throughput).
WY = 128                  # 120 logical rows + 8 alignment slack
WX = 256                  # 128 logical cols + 128 alignment slack
NPAD = 448                # 441 descriptor taps padded to a lane multiple
OPAD = 128                # 121 orientation taps padded
BINS = 48                 # 42 histogram bins padded
H_PI = math.pi / 2.0


@lru_cache(maxsize=None)
def _orient_weight_col():
    """[OPAD, 1] disc weights (0 outside r^2 < 36), tap = a*11 + b."""
    wt = _d._orient_grid()                       # [11, 11]
    w = np.zeros((OPAD, 1), np.float32)
    w[:121, 0] = wt.reshape(-1)
    return w


@lru_cache(maxsize=None)
def _band_matrix():
    """[BINS, BINS]: re8[b] = sum_{d=0..6} res[(b + d) % 42] for b < 42."""
    S = np.zeros((BINS, BINS), np.float32)
    for b in range(42):
        for d in range(7):
            S[(b + d) % 42, b] = 1.0
    return S


@lru_cache(maxsize=None)
def _descriptor_tables(patsize: int):
    """(l [NPAD,1], k [NPAD,1], M32 [NPAD, 32] cell membership,
    live [NPAD,1])."""
    l, k, M = _d._descriptor_window(patsize)     # M: [n, 29]
    n = len(l)
    lp = np.zeros((NPAD, 1), np.float32)
    kp = np.zeros((NPAD, 1), np.float32)
    lp[:n, 0] = l
    kp[:n, 0] = k
    M32 = np.zeros((NPAD, 32), np.float32)
    M32[:n, :29] = M
    live = np.zeros((NPAD, 1), np.float32)
    live[:n, 0] = 1.0
    return lp, kp, M32, live


@lru_cache(maxsize=None)
def _group_to_interleaved():
    """[96] lane permutation: grouped (im | rx | ry in 32-lane groups) ->
    the cell*3+chan layout of descriptor._compare_matrices."""
    idx = np.zeros(96, np.int32)
    for t in range(87):
        cell, chan = t // 3, t % 3
        idx[t] = chan * 32 + cell
    return idx


# atan(z)/z on z in [0, 1] as a degree-9 polynomial in z^2 (least-squares
# Chebyshev fit; max abs error 7.6e-9 — far below the 42-bin quantisation of
# the orientation histogram).  Pallas TPU has no atan2 lowering, so the true
# arctan2 of the XLA float path is replaced by this + quadrant logic.
_ATAN_COEFS = (9.9999999814e-01, -3.3333292795e-01, 1.9998532540e-01,
               -1.4264892055e-01, 1.0958362103e-01, -8.4276296054e-02,
               5.8457820666e-02, -3.1750529703e-02, 1.1257624297e-02,
               -1.8775595035e-03)


def _atan2_poly(y, x):
    """Accurate atan2 from the polynomial above, elementwise."""
    absx = jnp.abs(x)
    absy = jnp.abs(y)
    mx = jnp.maximum(absx, absy)
    mn = jnp.minimum(absx, absy)
    z = mn / jnp.where(mx == 0, 1.0, mx)
    t = z * z
    acc = jnp.full_like(z, _ATAN_COEFS[-1])
    for c in _ATAN_COEFS[-2::-1]:
        acc = acc * t + c
    r = acc * z
    r = jnp.where(absy > absx, H_PI - r, r)
    r = jnp.where(x < 0, math.pi - r, r)
    r = jnp.where(y < 0, -r, r)
    return r


def _fast_atan2(y, x):
    """dFastAtan2 polynomial (akazed.cu:173-185), elementwise."""
    absx = jnp.abs(x)
    absy = jnp.abs(y)
    mx = jnp.maximum(absx, absy)
    mn = jnp.minimum(absx, absy)
    a = mn / jnp.where(mx == 0, 1.0, mx)
    s = a * a
    r = ((-0.0464964749 * s + 0.15931422) * s - 0.327622764) * s * a + a
    r = jnp.where(absy > absx, H_PI - r, r)
    r = jnp.where(x < 0, math.pi - r, r)
    r = jnp.where(y < 0, -r, r)
    return r


def _make_kernel(kb: int, patsize: int, n_steps: int,
                 parts: str = "both", wy: int = WY, wx: int = WX,
                 zero_dead: bool = True, col_major: bool = False,
                 fixed: bool = False, nbuf: int = 2):
    """Batched-block kernel: the per-keypoint formulation issued ~45 small
    vector/matrix ops per keypoint and was op-issue bound (~3 us/kp).  Here
    only the window-dependent sampling matmuls stay per-keypoint; everything
    downstream (disc weighting, atan2, histogram, band scan, arg-max, tap
    geometry, cell sums, rotation) runs once per kb-block on [.., kb]-shaped
    arrays, reducing per-keypoint op count by ~5x.

    ``fixed``: bit-faithful 16.16 fixed-point flavour — float32 windows
    (int plane values < 2^24 are exact in f32), the reference's fast
    polynomial atan2 for per-sample orientation angles (akazed.cu:3685),
    and per-tap derivative rotation + int truncation BEFORE the cell sums
    (akazed.cu:3779-3780; truncation does not commute past summation, so
    the float path's rotate-the-cell-sums shortcut is unavailable).
    Costs ~2-4x the bf16 sampling matmul throughput — the default fixed
    path keeps the approximate bf16 kernel (fastakaze's speed-over-
    exactness spirit); this flavour is the bit-faithful on-TPU option.
    """
    sdt = jnp.float32 if fixed else jnp.bfloat16
    def one_hot_rows(idx_col, width, dtype):
        """[n, 1] int32 -> [n, width] one-hot (all-zero for idx < 0)."""
        lanes = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0],
                                                     width), 1)
        return (idx_col == lanes).astype(dtype)

    def kernel(iparams_ref,           # prefetch [N*8] int32 (flat; SMEM
               #   pads 2D rows to 128 lanes): per keypoint
               #   (plane, y0, x0, oy, ox, iscale, valid, 0); oy/ox = the
               #   reference's int(x+0.5)>>o orientation center, window-local
               fparams_ref,           # prefetch [N*4] f32: yc, xc, scale, -
               pl_ref,                # [P, Hp, Wp] bf16 L planes (HBM)
               px_ref,                # [P, Hp, Wp] bf16 Lx planes (HBM)
               py_ref,                # [P, Hp, Wp] bf16 Ly planes (HBM)
               wtv_ref,               # [OPAD, 1] f32 disc weights
               band_ref,              # [BINS, BINS] f32 7-bin window summer
               lof_ref,               # [NPAD, 1] f32 descriptor l offsets
               kof_ref,               # [NPAD, 1] f32 descriptor k offsets
               dlive_ref,             # [NPAD, 1] f32 tap liveness
               m32_ref,               # [NPAD, 32] f32 cell membership
               g2_ref,                # [2*kb*WX, 2*kb] f32 select-reduce
               angle_ref,             # out [kb, 128] f32
               acc_ref,               # out [kb, 128] f32
               wnd,                   # scratch [2, kb, WY, 3*WX] bf16
               sems):                 # DMA sems [2, kb, 3]
        step = pl.program_id(0)
        wtv = wtv_ref[:]
        band = band_ref[:]
        lof = lof_ref[:]
        kof = kof_ref[:]
        dlive = dlive_ref[:]
        M32 = m32_ref[:]

        plane_refs = (pl_ref, px_ref, py_ref)

        def dma(slot, blk, j, t):
            i = blk * kb + j
            p = iparams_ref[8 * i + 0]
            y0 = iparams_ref[8 * i + 1]
            x0 = iparams_ref[8 * i + 2]
            # tile-aligned origin (Mosaic must *prove* divisibility)
            y0a = pl.multiple_of((y0 // 8) * 8, 8)
            x0a = pl.multiple_of((x0 // 128) * 128, 128)
            return pltpu.make_async_copy(
                plane_refs[t].at[p, pl.ds(y0a, wy), pl.ds(x0a, wx)],
                wnd.at[slot, j, :, pl.ds(t * wx, wx)],
                sems.at[slot, j, t])

        # valid keypoints occupy a prefix of the slot array (masked-nonzero
        # compaction, detect.select_keypoints), so a block whose first slot
        # is invalid is entirely invalid: skip its DMA and compute.  Work
        # then scales with the *actual* keypoint count, not the capacity.
        def block_live(blk):
            return iparams_ref[8 * (blk * kb) + 6] > 0

        nplanes_dma = 1 if parts == "dma1" else 3
        # measurement mode desc2x: every window copied twice (identical
        # data, double HBM traffic) — separates DMA-overlapped-with-compute
        # from DMA-serialized-with-compute
        dma_repeat = 2 if parts == "desc2x" else 1

        # warm-up: fill nbuf-1 buffers at step 0; steady state issues the
        # block nbuf-1 ahead (nbuf=2 is classic double buffering)
        for d in range(nbuf - 1):
            @pl.when((step == 0) & (d < n_steps)
                     & block_live(jnp.minimum(d, n_steps - 1)))
            def _(d=d):
                for _r in range(dma_repeat):
                    for j in range(kb):
                        for t in range(nplanes_dma):
                            dma(d % nbuf, d, j, t).start()

        nxt = step + nbuf - 1
        @pl.when((nxt < n_steps) & block_live(
            jnp.minimum(nxt, n_steps - 1)))
        def _():
            for _r in range(dma_repeat):
                for j in range(kb):
                    for t in range(nplanes_dma):
                        dma(nxt % nbuf, nxt, j, t).start()

        slot = step % nbuf

        def compute_block(step, slot):
            if parts in ("dma", "dma1"):
                # measurement mode: window streaming only (one elementwise
                # touch so the DMA cannot be elided), no sampling compute
                angle_ref[...] = jnp.broadcast_to(
                    jnp.sum(wnd[slot, 0, :8, :128].astype(jnp.float32)),
                    (kb, WSIZE))
                acc_ref[...] = jnp.zeros((kb, WSIZE), jnp.float32)
                return
            # ---- gather per-keypoint scalars into [1, kb] rows ----
            sy_l, sx_l, yc_l, xc_l, sc_l, oy_l, ox_l, isc_l = ([] for _
                                                               in range(8))
            for j in range(kb):
                i = step * kb + j
                sy = iparams_ref[8 * i + 1] % 8
                sx = iparams_ref[8 * i + 2] % 128
                sy_l.append(sy)
                sx_l.append(sx)
                yc_l.append(fparams_ref[4 * i + 0] + sy.astype(jnp.float32))
                xc_l.append(fparams_ref[4 * i + 1] + sx.astype(jnp.float32))
                sc_l.append(fparams_ref[4 * i + 2])
                oy_l.append(iparams_ref[8 * i + 3] + sy)
                ox_l.append(iparams_ref[8 * i + 4] + sx)
                isc_l.append(iparams_ref[8 * i + 5])
            yc_row = jnp.stack(yc_l).reshape(1, kb)
            xc_row = jnp.stack(xc_l).reshape(1, kb)
            sc_row = jnp.stack(sc_l).reshape(1, kb)

            # ---- orientation: 11x11 disc at per-kp stride ----
            # tap = a*11 + b; row offset j = a-5, col offset i = b-5
            if parts in ("desc", "desc2x"):
                angle = jnp.zeros((kb, 1), jnp.float32)
            else:
                tap = jax.lax.broadcasted_iota(jnp.int32, (OPAD, 1), 0)
                ta = tap // 11
                tb = tap - 11 * ta
                Ts = []
                cols2 = []
                for j in range(kb):
                    orow = oy_l[j] + isc_l[j] * (ta - 5)
                    ocol = ox_l[j] + isc_l[j] * (tb - 5)
                    orow = jnp.where(tap >= 121, -1, orow)
                    row_oh = one_hot_rows(orow, wy, sdt)
                    # both derivative planes in one matmul (Mosaic
                    # requires 32-bit MXU accumulators; the selected
                    # values are bf16-exact, so the narrowing cast after
                    # is value-preserving)
                    T = jax.lax.dot_general(
                        row_oh, wnd[slot, j, :, wx:3 * wx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # [OPAD, 2WX]
                    Ts.append(T.astype(sdt))
                    c = one_hot_rows(ocol, wx, sdt)
                    cols2.append(jnp.concatenate([c, c], axis=1))
                T_all = jnp.concatenate(Ts, axis=1)        # [OPAD, kb*2wx]
                C_all = jnp.concatenate(cols2, axis=1)
                # selection-exact in sdt: one nonzero per (tap, chunk)
                P = T_all * C_all
                # block-ones reduce: [OPAD, kb*2WX] @ [kb*2WX, 2kb]
                gxy = jax.lax.dot_general(
                    P, g2_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [OPAD, 2kb]
                gx = gxy[:, :kb]
                gy = gxy[:, kb:2 * kb]
                dx = wtv * gx                               # [OPAD, kb]
                dy = wtv * gy
                # fixed path: the reference's coarse polynomial
                # (dFastAtan2) decides the histogram bin; float path the
                # accurate fit (atan2 has no Pallas lowering either way)
                ang = (_fast_atan2(dy, dx) if fixed
                       else _atan2_poly(dy, dx))
                abin = jnp.clip((ang * (21.0 / math.pi)).astype(jnp.int32)
                                + 21, 0, 41)
                # 42-bin weighted histogram for all kb at once, in
                # keypoint-major 128-lane blocks (lane l = k*128 + b).  The
                # column k -> lane-block expansion is a 0/1 matmul; cross-
                # lane reshapes are unsupported in Mosaic, so the final
                # [1, kb*128] -> [kb, 128] regroup is static slices+concat.
                expk = (jax.lax.broadcasted_iota(
                    jnp.int32, (kb, kb * 128), 1) // 128
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (kb, kb * 128), 0)).astype(jnp.float32)

                def expand(v):
                    return jax.lax.dot_general(
                        v, expk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                dxE = expand(dx)                         # [OPAD, kb*128]
                dyE = expand(dy)
                abE = expand(abin.astype(jnp.float32)).astype(jnp.int32)
                b_lane = jax.lax.broadcasted_iota(
                    jnp.int32, (OPAD, kb * 128), 1) % 128
                hit = (abE == b_lane) & (wtv > 0)
                resx_f = jnp.sum(jnp.where(hit, dxE, 0.0), axis=0,
                                 keepdims=True)          # [1, kb*128]
                resy_f = jnp.sum(jnp.where(hit, dyE, 0.0), axis=0,
                                 keepdims=True)
                resx = jnp.concatenate(
                    [resx_f[:, 128 * k:128 * (k + 1)] for k in range(kb)],
                    axis=0)                              # [kb, 128]
                resy = jnp.concatenate(
                    [resy_f[:, 128 * k:128 * (k + 1)] for k in range(kb)],
                    axis=0)
                re8x = jax.lax.dot_general(
                    resx[:, :BINS], band, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [kb, BINS]
                re8y = jax.lax.dot_general(
                    resy[:, :BINS], band, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                mag = re8x * re8x + re8y * re8y
                blane = jax.lax.broadcasted_iota(jnp.int32, (kb, BINS), 1)
                mag = jnp.where(blane < 42, mag, -1.0)
                # first maximum per row (strict scan, akazed.cu:1720)
                maxv = jnp.max(mag, axis=1, keepdims=True)
                first = jnp.min(jnp.where(mag == maxv, blane, BINS),
                                axis=1, keepdims=True)
                sel = (blane == first).astype(jnp.float32)
                bx = jnp.sum(re8x * sel, axis=1, keepdims=True)  # [kb, 1]
                by = jnp.sum(re8y * sel, axis=1, keepdims=True)
                angle = _fast_atan2(by, bx)
                angle = jnp.where(angle < 0.0, angle + 2.0 * math.pi,
                                  angle)                 # [kb, 1]
            angle_col = angle
            angle_ref[...] = jnp.broadcast_to(angle_col, (kb, WSIZE))

            # ---- descriptor cell sums ----
            if parts == "orient":
                acc_ref[...] = jnp.zeros((kb, WSIZE), jnp.float32)
                return
            co_col = jnp.cos(angle_col)                     # [kb, 1]
            si_col = jnp.sin(angle_col)
            # transpose [kb, 1] -> [1, kb] via identity contraction (Mosaic
            # has no free small transpose)
            eye_kb = (jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 0)
                      == jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 1)
                      ).astype(jnp.float32)
            co_row = jax.lax.dot_general(
                co_col, eye_kb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [1, kb]
            si_row = jax.lax.dot_general(
                si_col, eye_kb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if col_major:
                # Column-major sampling: contract the x selection on the
                # MXU first (wnd [wy, wx] @ colT [wx, NPAD]), then resolve
                # the y selection with a cheap SUBLANE-reduced elementwise
                # product.  vs the row-major path this removes the
                # [NPAD, 3wx] elementwise product + three LANE reductions
                # at the cost of two extra per-keypoint matmuls.  MEASURED
                # on v5e (stock pair): 3.65 ms vs 3.34 ms row-major — the
                # extra per-keypoint matmul issues outweigh the VPU
                # savings, so row-major stays the default; kept
                # (bit-identical, interpret-tested) for hardware where the
                # MXU/VPU balance differs.  Tap geometry is rebuilt in row
                # layout from an iota (same l/k tables as
                # _descriptor_window).
                size3 = -(-2 * patsize // 3)
                size4 = -(-patsize // 2)
                winsize = max(3 * size3, 4 * size4)
                t_row = jax.lax.broadcasted_iota(jnp.int32, (1, NPAD), 1)
                yq = t_row // winsize
                xq = t_row - winsize * yq
                lof_row = (xq - patsize).astype(jnp.float32)
                kof_row = (yq - patsize).astype(jnp.float32)
                dlive_row = t_row < winsize * winsize
                iota_wx = jax.lax.broadcasted_iota(jnp.int32, (wx, NPAD), 0)
                iota_wy = jax.lax.broadcasted_iota(jnp.int32, (wy, NPAD), 0)
                Ss = []
                for j in range(kb):
                    co_j = co_col[j:j + 1, :]               # [1, 1]
                    si_j = si_col[j:j + 1, :]
                    xp_row = (xc_l[j] + sc_l[j]
                              * (kof_row * co_j - lof_row * si_j)
                              + 0.5).astype(jnp.int32)      # [1, NPAD]
                    yp_row = (yc_l[j] + sc_l[j]
                              * (kof_row * si_j + lof_row * co_j)
                              + 0.5).astype(jnp.int32)
                    yp_row = jnp.where(dlive_row, yp_row, -1)
                    colT = (iota_wx == jnp.broadcast_to(xp_row, (wx, NPAD))
                            ).astype(jnp.bfloat16)          # [wx, NPAD]
                    rowT = (iota_wy == jnp.broadcast_to(yp_row, (wy, NPAD))
                            ).astype(jnp.float32)           # [wy, NPAD]
                    for t in range(3):
                        Tx = jax.lax.dot_general(
                            wnd[slot, j, :, t * wx:(t + 1) * wx], colT,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [wy,NPAD]
                        Ss.append(jnp.sum(rowT * Tx, axis=0,
                                          keepdims=True))   # [1, NPAD]
                S_rows = jnp.concatenate(Ss, axis=0)        # [3kb, NPAD]
                acc = jax.lax.dot_general(
                    S_rows, M32, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [3kb, 32]
            else:
                # rotated tap positions for all kb keypoints: [NPAD, kb]
                xp = (xc_row + sc_row * (kof * co_row - lof * si_row)
                      + 0.5).astype(jnp.int32)
                yp = (yc_row + sc_row * (kof * si_row + lof * co_row)
                      + 0.5).astype(jnp.int32)
                yp = jnp.where(dlive > 0, yp, -1)
                Ss = []
                for j in range(kb):
                    row_oh = one_hot_rows(yp[:, j:j + 1], wy, sdt)
                    T = jax.lax.dot_general(
                        row_oh, wnd[slot, j], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [NPAD, 3WX]
                    c = one_hot_rows(xp[:, j:j + 1], wx, sdt)
                    c3 = jnp.concatenate([c, c, c], axis=1)
                    # the product has exactly ONE nonzero per (tap, chunk)
                    # row — the selected sample — so the product and chunk
                    # reductions are exact in the sampling dtype (bf16 on
                    # the float path), halving their VPU bytes
                    Pj = T.astype(sdt) * c3
                    # reduce each WX chunk: [NPAD, 3WX] -> [NPAD, 3]
                    Sj = (jnp.sum(Pj[:, :wx], axis=1, keepdims=True),
                          jnp.sum(Pj[:, wx:2 * wx], axis=1, keepdims=True),
                          jnp.sum(Pj[:, 2 * wx:], axis=1, keepdims=True))
                    Ss.extend(Sj)
                S_all = jnp.concatenate(Ss, axis=1).astype(
                    jnp.float32)                            # [NPAD, 3kb]
                if fixed:
                    # per-tap rotation + int truncation BEFORE the cell
                    # sums (akazed.cu:3779-3780).  Column t = 3j + c holds
                    # plane c of keypoint j; neighbours along lanes give
                    # the (dx, dy) partner of each derivative column.
                    E3 = (jax.lax.broadcasted_iota(
                        jnp.int32, (kb, 3 * kb), 1) // 3
                        == jax.lax.broadcasted_iota(
                            jnp.int32, (kb, 3 * kb), 0)).astype(jnp.float32)
                    co3r = jax.lax.dot_general(
                        co_col, E3, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [1, 3kb]
                    si3r = jax.lax.dot_general(
                        si_col, E3, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    S_next = pltpu.roll(S_all, 3 * kb - 1, axis=1)
                    S_prev = pltpu.roll(S_all, 1, axis=1)
                    rx = (-si3r) * S_all + co3r * S_next  # at cols 3j+1
                    ry = co3r * S_prev + si3r * S_all     # at cols 3j+2
                    colt = jax.lax.broadcasted_iota(
                        jnp.int32, (NPAD, 3 * kb), 1) % 3

                    def trunc(v):
                        return v.astype(jnp.int32).astype(jnp.float32)

                    S_all = jnp.where(colt == 0, S_all,
                                      jnp.where(colt == 1, trunc(rx),
                                                trunc(ry)))
                acc = jax.lax.dot_general(
                    S_all, M32, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [3kb, 32]
            if fixed:
                # already rotated + truncated per tap above
                rot = acc
            else:
                # rotate derivative cell sums (linear, commutes with the
                # cell sums on the float path); rows are (im, dx, dy) per
                # keypoint.  row r needs coefficient of keypoint r // 3
                # (pltpu.repeat tiles, so build the 3x row-expansion with a
                # selection matmul)
                R3 = (jax.lax.broadcasted_iota(jnp.int32, (3 * kb, kb), 1)
                      == jax.lax.broadcasted_iota(jnp.int32,
                                                  (3 * kb, kb), 0)
                      // 3).astype(jnp.float32)
                co3 = jax.lax.dot_general(
                    R3, co_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [3kb, 1]
                si3 = jax.lax.dot_general(
                    R3, si_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # roll requires a non-negative shift; -1 == 3kb-1 mod 3kb
                acc_up = pltpu.roll(acc, 3 * kb - 1, axis=0)  # 3j+1 <- dy
                acc_dn = pltpu.roll(acc, 1, axis=0)    # row 3j+2 -> dx row
                rx_full = (-si3) * acc + co3 * acc_up
                ry_full = co3 * acc_dn + si3 * acc
                rowt = jax.lax.broadcasted_iota(
                    jnp.int32, (3 * kb, 1), 0) % 3
                rot = jnp.where(rowt == 0, acc,
                                jnp.where(rowt == 1, rx_full, ry_full))
            # regroup [3kb, 32] -> [kb, 96] (lanes: im | rx | ry) with three
            # row-selection matmuls (avoids a cross-sublane reshape)
            rows = jax.lax.broadcasted_iota(jnp.int32, (kb, 3 * kb), 1)
            ks = jax.lax.broadcasted_iota(jnp.int32, (kb, 3 * kb), 0)
            groups = [
                jax.lax.dot_general(
                    (rows == 3 * ks + c).astype(jnp.float32), rot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [kb, 32]
                for c in range(3)]
            acc_ref[...] = jnp.concatenate(
                groups + [jnp.zeros((kb, WSIZE - 96), jnp.float32)], axis=1)

        if zero_dead:
            # single-kernel mode: dead blocks' output slots are consumed
            # directly, so they must read as zero
            @pl.when(jnp.logical_not(block_live(step)))
            def _():
                angle_ref[...] = jnp.zeros_like(angle_ref)
                acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(block_live(step))
        def _():
            for _r in range(dma_repeat):
                for j in range(kb):
                    for t in range(nplanes_dma):
                        dma(slot, step, j, t).wait()
            compute_block(step, slot)

    return kernel


@lru_cache(maxsize=None)
def _g2_matrix(kb: int, wx: int = WX):
    """[kb*2*wx, 2*kb] block-ones: column j sums the gx chunk of keypoint
    j, column kb+j the gy chunk."""
    G = np.zeros((kb * 2 * wx, 2 * kb), np.float32)
    for j in range(kb):
        G[j * 2 * wx:j * 2 * wx + wx, j] = 1.0
        G[j * 2 * wx + wx:(j + 1) * 2 * wx, kb + j] = 1.0
    return G


@partial(jax.jit, static_argnames=("patsize", "kb", "interpret", "parts",
                                   "wy", "wx", "zero_dead", "col_major",
                                   "fixed", "nbuf"))
def orient_describe(iparams, fparams, planes, patsize: int = 10,
                    kb: int = 8, interpret: bool = False,
                    parts: str = "both", wy: int = WY, wx: int = WX,
                    zero_dead: bool = True, col_major: bool = False,
                    fixed: bool = False, nbuf: int = 2):
    """Run the fused kernel.

    Args:
      iparams: [N, 8] int32 per keypoint: (plane, y0, x0, oy, ox, iscale,
        0, 0) with (y0, x0) the clamped window origin in padded-plane
        coords, (oy, ox) the reference's integer orientation center
        (int(x+0.5) >> octave, window-local), iscale the sigma step.
      fparams: [N, 4] f32 per keypoint: (yc, xc, scale, unused) with
        (yc, xc) the sub-pixel center in window-local coords and scale ==
        float(iscale).
      planes: tuple of three [P, Hp, Wp] bf16 padded plane stacks
        (L, Lx, Ly) — separate arrays so no [3, P, Hp, Wp] stack copy is
        ever materialised.  f32 stacks for the bit-faithful ``fixed``
        flavour (int plane values < 2^24 stay exact).
      fixed: bit-faithful 16.16 fixed-point sampling semantics (see
        _make_kernel); requires f32 ``planes``.

    Returns (angle [N] f32, acc [N, 87] f32 in cell*3+chan lane layout,
    matching descriptor._compare_matrices).
    """
    n = iparams.shape[0]
    assert n % kb == 0, "pad keypoint count to a multiple of kb"
    assert wy % 8 == 0, "wy must be sublane-aligned"
    assert not (fixed and col_major), "col_major is a float-path variant"
    if fixed:
        assert all(p.dtype == jnp.float32 for p in planes), \
            "fixed flavour samples f32 planes"
    n_steps = n // kb
    kernel = _make_kernel(kb, patsize, n_steps, parts, wy, wx, zero_dead,
                          col_major, fixed, nbuf)
    iparams = iparams.reshape(-1)
    fparams = fparams.reshape(-1)

    wtv = jnp.asarray(_orient_weight_col())
    band = jnp.asarray(_band_matrix())
    lof_np, kof_np, M32_np, dlive_np = _descriptor_tables(patsize)

    def const_spec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, *_: zeros,
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  const_spec((OPAD, 1)),
                  const_spec((BINS, BINS)),
                  const_spec((NPAD, 1)),
                  const_spec((NPAD, 1)),
                  const_spec((NPAD, 1)),
                  const_spec((NPAD, 32)),
                  const_spec((kb * 2 * wx, 2 * kb))],
        out_specs=[
            pl.BlockSpec((kb, WSIZE), lambda i, *_: (i, 0)),
            pl.BlockSpec((kb, WSIZE), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, kb, wy, 3 * wx),
                       jnp.float32 if fixed else jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nbuf, kb, 3)),
        ],
    )
    angle_b, acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, WSIZE), jnp.float32),
            jax.ShapeDtypeStruct((n, WSIZE), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(iparams, fparams, planes[0], planes[1], planes[2], wtv, band,
      jnp.asarray(lof_np), jnp.asarray(kof_np), jnp.asarray(dlive_np),
      jnp.asarray(M32_np),
      # the g2 block-ones reduce is selection-exact, so it rides the MXU
      # in the sampling dtype on the float path
      jnp.asarray(_g2_matrix(kb, wx),
                  jnp.float32 if fixed else jnp.bfloat16))
    perm = jnp.asarray(_group_to_interleaved())
    return angle_b[:, 0], acc[:, perm][:, :87]


# --------------------------------------------------------------------------
# Banded-window kernel: shared row-band delivery (round-5 architecture)
# --------------------------------------------------------------------------
#
# The r1-r4 kernel streams one private [128, 256]x3 bf16 window per keypoint
# — 1.58 GB/stock-pair, measured 2.25 ms at ~80% of HBM peak and only
# half-overlapped with compute (BENCH_NOTES r4 roofline).  Keypoints cluster
# in rows, so here blocks of kb band-sorted keypoints share ONE [BH, W]
# plane band resident in VMEM and every keypoint's window is sliced out of
# it *in place*: the sampling matmuls read the band at dynamically-offset
# (tile-aligned, `pl.multiple_of`-proved) row/lane positions, so no window
# copy exists at all.  Measured band traffic at stock density: ~210 MB/pair
# (~8x less).  Sampling positions are absolute, so outputs are bit-identical
# to the per-keypoint kernel.
#
# Block types (host-side in-graph classification, descriptor.py):
#   0  banded, band already resident (no DMA)
#   1  banded, new band: 3 copies of planes[p, bandy:bandy+BH, :W]
#   2  parked: the block spans planes or >BH-128 rows of window origins
#      (plane transitions in the sorted order, sparse tails) — each keypoint
#      gets its private [128, 256]x3 window DMA'd into a parking grid in
#      the same band buffer (rows 128*(j%3), lanes 768*(j//3)), so COMPUTE
#      is uniform: every keypoint reads band[slot, row8*8 :+128,
#      lane*128 :+256] wherever its window lives.
# Band slots double-buffer: the slot flips on every DMA event (btype>0),
# and block s+1's DMAs are issued before block s's compute so band
# streaming overlaps compute.

BH = 384          # band rows (grid stride 128: origin rounddown(y0, 128)
#                   covers window-origin spans of up to BH-128 rows; also
#                   exactly 3 parking rows of 128)


def _banded_lanes(kb: int, wpl: int) -> int:
    """Scratch lane count: the 3-plane band region or the parking grid,
    whichever is wider."""
    ncols = -(-kb // (BH // 128))
    return max(3 * wpl, 768 * ncols)


def _make_banded_kernel(kb: int, patsize: int, n_steps: int, wpl: int,
                        parts: str = "both", fixed: bool = False,
                        nbuf: int = 2, hist: str = "bins"):
    """``hist``: orientation-histogram formulation.  "lanes" is the
    private-window kernel's layout (bins at lane k*128+b of a
    [OPAD, kb*128] expansion) — sized for kb=8, it grows linearly in kb
    and at the banded KB=40 the three [128, kb*128] f32 expansions
    dominate the orientation phase.  "bins" loops the 42 bins over the
    existing [OPAD, kb] arrays (one masked tap-axis sum per bin, summands
    and order identical, so results are bit-equal) and runs the band
    window / first-max tail transposed as [BINS, kb]."""
    sdt = jnp.float32 if fixed else jnp.bfloat16
    lanes_total = _banded_lanes(kb, wpl)

    def one_hot_rows(idx_col, width, dtype):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0],
                                                     width), 1)
        return (idx_col == lanes).astype(dtype)

    wl = wpl // 128

    # Prefetch arrives as FIVE separate, bit-packed 1D arrays rather than
    # interleaved [N, k] tables: the column interleave is a cross-lane
    # relayout that measured ~1.9 ms at pair scale, and live-produced
    # prefetch operands serialize against the kernel launch roughly in
    # proportion to their count and bytes (V1/V2 provenance bisect,
    # BENCH_NOTES r5) — so the scalar side is squeezed to ~100 KB:
    #   w1 [N]: window address union, discriminated by the BLOCK type —
    #     banded: row8 | l0<<6  (units of 8 rows / 128 lanes inside the
    #       band buffer; plane t sits +t*wpl/128 lanes over)
    #     parked: plane | srcy8<<6 | srcx128<<16  (the private window DMA
    #       source; the parking position derives from the slot index j)
    #   w2 [N]: (oy+256) | (ox+256)<<10 | iscale<<20 — orientation center
    #     (window-local against the ALIGNED origin) and sigma step
    #   yc, xc [N] f32: sub-pixel center, window-local, aligned origin
    #   bw [S]: btype | live<<2 | slot<<3 | plane<<4 | bandy8<<10
    def kernel(w1_ref, w2_ref, yc_ref, xc_ref, bw_ref,
               pl_ref, px_ref, py_ref,  # [P, Hp, Wp] plane stacks (HBM)
               wtv_ref, band_mat_ref, lof_ref, kof_ref, dlive_ref,
               m32_ref, g2_ref,
               angle_ref, acc_ref,    # out [kb, 128] f32 blocks
               band,                  # scratch [nbuf, BH, lanes_total] sdt
               sems):                 # DMA sems [nbuf, kb, 3]
        step = pl.program_id(0)
        wtv = wtv_ref[:]
        band_mat = band_mat_ref[:]
        lof = lof_ref[:]
        kof = kof_ref[:]
        dlive = dlive_ref[:]
        M32 = m32_ref[:]
        plane_refs = (pl_ref, px_ref, py_ref)

        def band_dma(s, t):
            bw = bw_ref[s]
            p = (bw >> 4) % 64
            by = pl.multiple_of((bw >> 10) * 8, 8)
            slot = (bw >> 3) % 2
            return pltpu.make_async_copy(
                plane_refs[t].at[p, pl.ds(by, BH), pl.ds(0, wpl)],
                band.at[slot, :, pl.ds(t * wpl, wpl)],
                sems.at[slot, 0, t])

        def park_dma(s, j, t):
            w1 = w1_ref[s * kb + j]
            p = w1 % 64
            sy = pl.multiple_of(((w1 >> 6) % 1024) * 8, 8)
            sx = pl.multiple_of((w1 >> 16) * 128, 128)
            slot = (bw_ref[s] >> 3) % 2
            r0 = 128 * (j % (BH // 128))
            c0 = 768 * (j // (BH // 128)) + 256 * t
            return pltpu.make_async_copy(
                plane_refs[t].at[p, pl.ds(sy, 128), pl.ds(sx, 256)],
                band.at[slot, r0:r0 + 128, c0:c0 + 256],
                sems.at[slot, j, t])

        def live(s):
            return (bw_ref[s] >> 2) % 2 > 0

        def btype(s):
            return bw_ref[s] % 4

        def issue(s):
            @pl.when(btype(s) == 1)
            def _():
                for t in range(3):
                    band_dma(s, t).start()

            @pl.when(btype(s) == 2)
            def _():
                for j in range(kb):
                    for t in range(3):
                        park_dma(s, j, t).start()

        # warmup: own block's DMAs at step 0; steady state issues one ahead
        @pl.when((step == 0) & live(0))
        def _():
            issue(0)

        nxt = jnp.minimum(step + 1, n_steps - 1)

        @pl.when((step + 1 < n_steps) & live(nxt))
        def _():
            issue(nxt)

        def wait(s):
            @pl.when(btype(s) == 1)
            def _():
                for t in range(3):
                    band_dma(s, t).wait()

            @pl.when(btype(s) == 2)
            def _():
                for j in range(kb):
                    for t in range(3):
                        park_dma(s, j, t).wait()

        def compute_block(s):
            bw = bw_ref[s]
            slot = (bw >> 3) % 2
            is_band = (bw % 4 != 2).astype(jnp.int32)

            def window(j, t):
                w1 = w1_ref[s * kb + j]
                row8 = (is_band * (w1 % 64)
                        + (1 - is_band) * (16 * (j % (BH // 128))))
                lane = (is_band * (((w1 >> 6) % 64) + t * wl)
                        + (1 - is_band) * (6 * (j // (BH // 128)) + 2 * t))
                dy = pl.multiple_of(row8 * 8, 8)
                dx = pl.multiple_of(lane * 128, 128)
                return band[slot, pl.ds(dy, 128), pl.ds(dx, 256)]

            if parts == "dma":
                # measurement mode: band/parking traffic only, one touch
                angle_ref[...] = jnp.broadcast_to(
                    jnp.sum(band[slot, :8, :128].astype(jnp.float32)),
                    (kb, WSIZE))
                acc_ref[...] = jnp.zeros((kb, WSIZE), jnp.float32)
                return

            # ---- per-keypoint scalars in [1, kb] rows ----
            yc_l, xc_l, sc_l, oy_l, ox_l, isc_l = ([] for _ in range(6))
            for j in range(kb):
                i = s * kb + j
                yc_l.append(yc_ref[i])
                xc_l.append(xc_ref[i])
                w2 = w2_ref[i]
                oy_l.append(w2 % 1024 - 256)
                ox_l.append((w2 >> 10) % 1024 - 256)
                isc_l.append(w2 >> 20)
                sc_l.append(isc_l[-1].astype(jnp.float32))
            yc_row = jnp.stack(yc_l).reshape(1, kb)
            xc_row = jnp.stack(xc_l).reshape(1, kb)
            sc_row = jnp.stack(sc_l).reshape(1, kb)

            # ---- orientation (gCalcOrient semantics) ----
            if parts == "desc":
                angle = jnp.zeros((kb, 1), jnp.float32)
            else:
                tap = jax.lax.broadcasted_iota(jnp.int32, (OPAD, 1), 0)
                ta = tap // 11
                tb = tap - 11 * ta
                Ts = []
                cols2 = []
                for j in range(kb):
                    orow = oy_l[j] + isc_l[j] * (ta - 5)
                    ocol = ox_l[j] + isc_l[j] * (tb - 5)
                    orow = jnp.where(tap >= 121, -1, orow)
                    row_oh = one_hot_rows(orow, 128, sdt)
                    # one matmul per derivative plane (the band's planes
                    # are wpl lanes apart, unlike the private-window
                    # kernel's adjacent layout)
                    Tx = jax.lax.dot_general(
                        row_oh, window(j, 1), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    Ty = jax.lax.dot_general(
                        row_oh, window(j, 2), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    Ts.append(jnp.concatenate([Tx, Ty],
                                              axis=1).astype(sdt))
                    c = one_hot_rows(ocol, 256, sdt)
                    cols2.append(jnp.concatenate([c, c], axis=1))
                T_all = jnp.concatenate(Ts, axis=1)      # [OPAD, kb*512]
                C_all = jnp.concatenate(cols2, axis=1)
                P = T_all * C_all
                gxy = jax.lax.dot_general(
                    P, g2_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [OPAD, 2kb]
                gx = gxy[:, :kb]
                gy = gxy[:, kb:2 * kb]
                dx = wtv * gx
                dy = wtv * gy
                ang = (_fast_atan2(dy, dx) if fixed
                       else _atan2_poly(dy, dx))
                abin = jnp.clip((ang * (21.0 / math.pi)).astype(jnp.int32)
                                + 21, 0, 41)
                if hist == "bins":
                    # 42 masked tap-axis sums over the existing [OPAD, kb]
                    # arrays; summands and reduction axis match the
                    # "lanes" expansion exactly (the expansion copies
                    # dx[t, k] verbatim to lane k*128+b), so the sums are
                    # bit-equal while the arrays stay kb lanes wide
                    live_t = wtv > 0                         # [OPAD, 1]
                    brow = jax.lax.broadcasted_iota(
                        jnp.int32, (BINS, kb), 0)
                    resxT = jnp.zeros((BINS, kb), jnp.float32)
                    resyT = jnp.zeros((BINS, kb), jnp.float32)
                    for b in range(42):
                        hb = (abin == b) & live_t
                        rxb = jnp.sum(jnp.where(hb, dx, 0.0), axis=0,
                                      keepdims=True)         # [1, kb]
                        ryb = jnp.sum(jnp.where(hb, dy, 0.0), axis=0,
                                      keepdims=True)
                        resxT = resxT + jnp.where(brow == b, rxb, 0.0)
                        resyT = resyT + jnp.where(brow == b, ryb, 0.0)
                    re8xT = jax.lax.dot_general(
                        band_mat, resxT, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [BINS, kb]
                    re8yT = jax.lax.dot_general(
                        band_mat, resyT, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    mag = re8xT * re8xT + re8yT * re8yT
                    mag = jnp.where(brow < 42, mag, -1.0)
                    maxv = jnp.max(mag, axis=0, keepdims=True)
                    first = jnp.min(jnp.where(mag == maxv, brow, BINS),
                                    axis=0, keepdims=True)
                    sel = (brow == first).astype(jnp.float32)
                    bx = jnp.sum(re8xT * sel, axis=0, keepdims=True)
                    by = jnp.sum(re8yT * sel, axis=0, keepdims=True)
                    ang_row = _fast_atan2(by, bx)            # [1, kb]
                    ang_row = jnp.where(ang_row < 0.0,
                                        ang_row + 2.0 * math.pi, ang_row)
                    eye_t = (jax.lax.broadcasted_iota(
                        jnp.int32, (kb, kb), 0)
                        == jax.lax.broadcasted_iota(
                            jnp.int32, (kb, kb), 1)).astype(jnp.float32)
                    # [1, kb] -> [kb, 1] via an exact 0/1 contraction
                    angle = jax.lax.dot_general(
                        eye_t, ang_row, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    expk = (jax.lax.broadcasted_iota(
                        jnp.int32, (kb, kb * 128), 1) // 128
                        == jax.lax.broadcasted_iota(
                            jnp.int32, (kb, kb * 128), 0)).astype(
                                jnp.float32)

                    def expand(v):
                        return jax.lax.dot_general(
                            v, expk, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    dxE = expand(dx)
                    dyE = expand(dy)
                    abE = expand(abin.astype(jnp.float32)).astype(jnp.int32)
                    b_lane = jax.lax.broadcasted_iota(
                        jnp.int32, (OPAD, kb * 128), 1) % 128
                    hit = (abE == b_lane) & (wtv > 0)
                    resx_f = jnp.sum(jnp.where(hit, dxE, 0.0), axis=0,
                                     keepdims=True)
                    resy_f = jnp.sum(jnp.where(hit, dyE, 0.0), axis=0,
                                     keepdims=True)
                    resx = jnp.concatenate(
                        [resx_f[:, 128 * k:128 * (k + 1)]
                         for k in range(kb)], axis=0)
                    resy = jnp.concatenate(
                        [resy_f[:, 128 * k:128 * (k + 1)]
                         for k in range(kb)], axis=0)
                    re8x = jax.lax.dot_general(
                        resx[:, :BINS], band_mat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    re8y = jax.lax.dot_general(
                        resy[:, :BINS], band_mat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    mag = re8x * re8x + re8y * re8y
                    blane = jax.lax.broadcasted_iota(
                        jnp.int32, (kb, BINS), 1)
                    mag = jnp.where(blane < 42, mag, -1.0)
                    maxv = jnp.max(mag, axis=1, keepdims=True)
                    first = jnp.min(jnp.where(mag == maxv, blane, BINS),
                                    axis=1, keepdims=True)
                    sel = (blane == first).astype(jnp.float32)
                    bx = jnp.sum(re8x * sel, axis=1, keepdims=True)
                    by = jnp.sum(re8y * sel, axis=1, keepdims=True)
                    angle = _fast_atan2(by, bx)
                    angle = jnp.where(angle < 0.0, angle + 2.0 * math.pi,
                                      angle)
            angle_col = angle
            angle_ref[...] = jnp.broadcast_to(angle_col, (kb, WSIZE))

            # ---- descriptor cell sums (gDescribe2 semantics) ----
            if parts == "orient":
                acc_ref[...] = jnp.zeros((kb, WSIZE), jnp.float32)
                return
            co_col = jnp.cos(angle_col)
            si_col = jnp.sin(angle_col)
            eye_kb = (jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 0)
                      == jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 1)
                      ).astype(jnp.float32)
            co_row = jax.lax.dot_general(
                co_col, eye_kb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            si_row = jax.lax.dot_general(
                si_col, eye_kb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            xp = (xc_row + sc_row * (kof * co_row - lof * si_row)
                  + 0.5).astype(jnp.int32)
            yp = (yc_row + sc_row * (kof * si_row + lof * co_row)
                  + 0.5).astype(jnp.int32)
            yp = jnp.where(dlive > 0, yp, -1)
            Ss = []
            for j in range(kb):
                row_oh = one_hot_rows(yp[:, j:j + 1], 128, sdt)
                c = one_hot_rows(xp[:, j:j + 1], 256, sdt)
                for t in range(3):
                    Tt = jax.lax.dot_general(
                        row_oh, window(j, t), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [NPAD, 256]
                    Pt = Tt.astype(sdt) * c
                    Ss.append(jnp.sum(Pt, axis=1, keepdims=True))
            S_all = jnp.concatenate(Ss, axis=1).astype(
                jnp.float32)                                # [NPAD, 3kb]
            if fixed:
                E3 = (jax.lax.broadcasted_iota(
                    jnp.int32, (kb, 3 * kb), 1) // 3
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (kb, 3 * kb), 0)).astype(jnp.float32)
                co3r = jax.lax.dot_general(
                    co_col, E3, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                si3r = jax.lax.dot_general(
                    si_col, E3, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                S_next = pltpu.roll(S_all, 3 * kb - 1, axis=1)
                S_prev = pltpu.roll(S_all, 1, axis=1)
                rx = (-si3r) * S_all + co3r * S_next
                ry = co3r * S_prev + si3r * S_all
                colt = jax.lax.broadcasted_iota(
                    jnp.int32, (NPAD, 3 * kb), 1) % 3

                def trunc(v):
                    return v.astype(jnp.int32).astype(jnp.float32)

                S_all = jnp.where(colt == 0, S_all,
                                  jnp.where(colt == 1, trunc(rx),
                                            trunc(ry)))
            acc = jax.lax.dot_general(
                S_all, M32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [3kb, 32]
            if fixed:
                rot = acc
            else:
                R3 = (jax.lax.broadcasted_iota(jnp.int32, (3 * kb, kb), 1)
                      == jax.lax.broadcasted_iota(jnp.int32,
                                                  (3 * kb, kb), 0)
                      // 3).astype(jnp.float32)
                co3 = jax.lax.dot_general(
                    R3, co_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                si3 = jax.lax.dot_general(
                    R3, si_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_up = pltpu.roll(acc, 3 * kb - 1, axis=0)
                acc_dn = pltpu.roll(acc, 1, axis=0)
                rx_full = (-si3) * acc + co3 * acc_up
                ry_full = co3 * acc_dn + si3 * acc
                rowt = jax.lax.broadcasted_iota(
                    jnp.int32, (3 * kb, 1), 0) % 3
                rot = jnp.where(rowt == 0, acc,
                                jnp.where(rowt == 1, rx_full, ry_full))
            rows = jax.lax.broadcasted_iota(jnp.int32, (kb, 3 * kb), 1)
            ks = jax.lax.broadcasted_iota(jnp.int32, (kb, 3 * kb), 0)
            groups = [
                jax.lax.dot_general(
                    (rows == 3 * ks + c).astype(jnp.float32), rot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for c in range(3)]
            acc_ref[...] = jnp.concatenate(
                groups + [jnp.zeros((kb, WSIZE - 96), jnp.float32)],
                axis=1)

        # dead blocks' output slots are consumed directly -> read as zero
        @pl.when(jnp.logical_not(live(step)))
        def _():
            angle_ref[...] = jnp.zeros_like(angle_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(live(step))
        def _():
            wait(step)
            compute_block(step)

    return kernel


@partial(jax.jit, static_argnames=("patsize", "kb", "wpl", "interpret",
                                   "parts", "fixed", "nbuf", "hist"))
def orient_describe_banded(ikp, fkp, blkp, planes,
                           patsize: int = 10, kb: int = 8, wpl: int = 0,
                           interpret: bool = False, parts: str = "both",
                           fixed: bool = False, nbuf: int = 2,
                           hist: str = "bins"):
    """Run the banded-window fused kernel.

    Args:
      ikp: tuple of TWO [N] int32 bit-packed per-keypoint fields (w1, w2 —
        see _make_banded_kernel).  Separate packed 1D columns, NOT an
        [N, k] table: the column interleave is a measured ~1.9 ms
        relayout, and live prefetch operands serialize the kernel launch
        in proportion to their count/bytes.
      fkp: tuple of TWO [N] f32 fields (yc, xc), window-local against the
        tile-ALIGNED window origin.
      blkp: tuple of ONE [N//kb] int32 packed per-block field (bw).
      planes: three [P, Hp, Wp] plane stacks; Wp == wpl; Hp >= BH.

    Returns (angle [N] f32, acc [N, 87] f32), same layout as
    ``orient_describe``.
    """
    n = ikp[0].shape[0]
    assert n % kb == 0, "pad keypoint count to a multiple of kb"
    assert planes[0].shape[2] == wpl and wpl % 128 == 0
    assert planes[0].shape[1] >= BH, "pad plane stacks to >= BH rows"
    if fixed:
        assert all(p.dtype == jnp.float32 for p in planes)
    n_steps = n // kb
    kernel = _make_banded_kernel(kb, patsize, n_steps, wpl, parts, fixed,
                                 nbuf, hist)

    wtv = jnp.asarray(_orient_weight_col())
    band_mat = jnp.asarray(_band_matrix())
    lof_np, kof_np, M32_np, dlive_np = _descriptor_tables(patsize)

    def const_spec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, *_: zeros,
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  const_spec((OPAD, 1)),
                  const_spec((BINS, BINS)),
                  const_spec((NPAD, 1)),
                  const_spec((NPAD, 1)),
                  const_spec((NPAD, 1)),
                  const_spec((NPAD, 32)),
                  const_spec((kb * 2 * 256, 2 * kb))],
        out_specs=[
            pl.BlockSpec((kb, WSIZE), lambda i, *_: (i, 0)),
            pl.BlockSpec((kb, WSIZE), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, BH, _banded_lanes(kb, wpl)),
                       jnp.float32 if fixed else jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nbuf, kb, 3)),
        ],
    )
    angle_b, acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, WSIZE), jnp.float32),
            jax.ShapeDtypeStruct((n, WSIZE), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ikp, *fkp, *blkp, planes[0], planes[1], planes[2], wtv,
      band_mat, jnp.asarray(lof_np), jnp.asarray(kof_np),
      jnp.asarray(dlive_np), jnp.asarray(M32_np),
      jnp.asarray(_g2_matrix(kb, 256),
                  jnp.float32 if fixed else jnp.bfloat16))
    perm = jnp.asarray(_group_to_interleaved())
    return angle_b[:, 0], acc[:, perm][:, :87]
