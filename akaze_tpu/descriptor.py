"""Keypoint orientation and MLDB binary descriptor.

Reference kernels: gCalcOrient (akazed.cu:1665-1736; fixed akazed.cu:3649-3720)
and gDescribe2 (akazed.cu:1869-2001; fixed akazed.cu:3723-3855), with the
comparison-index tables from setCompareIndices (akazed.cu:65-159).

TPU design: the per-keypoint sampling patterns (orientation disc, descriptor
window, cell memberships, comparison pairs) are all *static* given the
config, so they become constant numpy tables.  Per-keypoint work is then:
one flat gather over the concatenated pyramid, a [N, 441] x [441, 29] cell-sum
matmul on the MXU (replacing the warp-shuffle tree reduction,
akazed.cu:1958-1983), and vectorised comparisons/packing.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DESCRIPTOR_BITS, DESCRIPTOR_WORDS
from .detect import FlatPyramid, Keypoints
from .plan import PipelinePlan

H_PI = math.pi / 2.0


def fast_atan2(y, x):
    """The reference's polynomial atan2 (dFastAtan2, akazed.cu:173-185)."""
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


# --------------------------------------------------------------------------
# static tables
# --------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _orient_table():
    """The 109-tap disc: i = (t & 15) - 6, j = (t / 16) - 6, keep i*i+j*j < 36
    (akazed.cu:1692-1695)."""
    ii, jj, wt = [], [], []
    for t in range(13 * 16):
        i = (t & 15) - 6
        j = (t // 16) - 6
        r2 = i * i + j * j
        if r2 < 36:
            ii.append(i)
            jj.append(j)
            wt.append(math.exp(-r2 * 0.08))
    return (np.asarray(ii, np.int32), np.asarray(jj, np.int32),
            np.asarray(wt, np.float32))


@lru_cache(maxsize=None)
def _descriptor_window(patsize: int):
    """Static window geometry of gDescribe2 (akazed.cu:1910-1954).

    Returns (l, k, membership M [winsize^2, 29]) where M[s, c] = 1 iff sample
    s contributes to cell c (cells: 4 of the 2x2 grid, 9 of 3x3, 16 of 4x4).
    """
    size2 = patsize
    size3 = math.ceil(2.0 * patsize / 3.0)
    size4 = math.ceil(0.5 * patsize)
    winsize = max(3 * size3, 4 * size4)
    n = winsize * winsize
    l = np.zeros(n, np.int32)
    k = np.zeros(n, np.int32)
    M = np.zeros((n, 29), np.float32)
    for s in range(n):
        y = s // winsize
        x = s - winsize * y
        m = max(x, y)
        l[s] = x - size2
        k[s] = y - size2
        if m < 2 * size2:
            x2 = 0 if x < size2 else 1
            y2 = 0 if y < size2 else 1
            M[s, y2 * 2 + x2] = 1.0
        if m < 3 * size3:
            x3 = 0 if x < size3 else (1 if x < 2 * size3 else 2)
            y3 = 0 if y < size3 else (1 if y < 2 * size3 else 2)
            M[s, 4 + y3 * 3 + x3] = 1.0
        if m < 4 * size4:
            x4 = (0 if x < size4 else 1) if x < 2 * size4 else \
                 (2 if x < 3 * size4 else 3)
            y4 = (0 if y < size4 else 1) if y < 2 * size4 else \
                 (2 if y < 3 * size4 else 3)
            M[s, 13 + y4 * 4 + x4] = 1.0
    return l, k, M


@lru_cache(maxsize=None)
def _compare_indices() -> Tuple[np.ndarray, np.ndarray]:
    """The 486 MLDB comparison pairs in emission order (setCompareIndices,
    akazed.cu:65-159).  Entries index the flattened [cell * 3 + channel]
    accumulator layout."""
    i1, i2 = [], []

    def block(cells, chan):
        cl = list(cells)
        for a in range(len(cl)):
            for b in range(a + 1, len(cl)):
                i1.append(3 * cl[a] + chan)
                i2.append(3 * cl[b] + chan)

    for chan in range(3):
        block(range(0, 4), chan)        # 2x2 grid
    for chan in range(3):
        block(range(4, 13), chan)       # 3x3 grid
    for chan in range(3):
        block(range(13, 29), chan)      # 4x4 grid
    assert len(i1) == DESCRIPTOR_BITS
    return np.asarray(i1, np.int32), np.asarray(i2, np.int32)


# --------------------------------------------------------------------------
# orientation
# --------------------------------------------------------------------------

def compute_orientation(kps: Keypoints, flat: FlatPyramid,
                        plan: PipelinePlan, fixed: bool = False):
    """Dominant orientation per keypoint (gCalcOrient).

    Float path uses true atan2 for the per-sample angle; the fixed-point
    kernel uses the fast polynomial (akazed.cu:3685) — both use the
    polynomial for the final angle.  Returns angle [max_pts] float32 in
    [0, 2*pi).
    """
    ms = plan.config.max_scale
    ii, jj, wt = _orient_table()
    ii = jnp.asarray(ii)
    jj = jnp.asarray(jj)
    wt = jnp.asarray(wt)

    o = jnp.maximum(kps.layer // ms, 0)
    s = kps.layer % ms
    wo = flat.widths[o]
    base = flat.offsets[o] + s * flat.plane[o]
    step = (kps.size + 0.5).astype(jnp.int32)
    x = (kps.x + 0.5).astype(jnp.int32) >> o
    y = (kps.y + 0.5).astype(jnp.int32) >> o

    # [N, 109] flat positions
    pos = base[:, None] + (y[:, None] + step[:, None] * jj[None, :]) \
        * wo[:, None] + (x[:, None] + step[:, None] * ii[None, :])
    lxv = flat.lx[pos].astype(jnp.float32)
    lyv = flat.ly[pos].astype(jnp.float32)
    dx = wt[None, :] * lxv
    dy = wt[None, :] * lyv
    ang = fast_atan2(dy, dx) if fixed else jnp.arctan2(dy, dx)
    a = jnp.clip((ang * (21.0 / math.pi)).astype(jnp.int32) + 21, 0, 41)

    # 42-bin accumulation as masked reductions (atomicAdd replacement,
    # akazed.cu:1702-1704)
    resx = []
    resy = []
    for b in range(42):
        m = (a == b)
        resx.append(jnp.sum(jnp.where(m, dx, 0.0), axis=1))
        resy.append(jnp.sum(jnp.where(m, dy, 0.0), axis=1))
    resx = jnp.stack(resx, axis=1)  # [N, 42]
    resy = jnp.stack(resy, axis=1)

    # sliding 7-bin circular window (akazed.cu:1708-1717)
    re8x = sum(jnp.roll(resx, -d, axis=1) for d in range(7))
    re8y = sum(jnp.roll(resy, -d, axis=1) for d in range(7))
    mag = re8x * re8x + re8y * re8y
    maxk = jnp.argmax(mag, axis=1)  # first maximum, matching the strict scan
    bx = jnp.take_along_axis(re8x, maxk[:, None], axis=1)[:, 0]
    by = jnp.take_along_axis(re8y, maxk[:, None], axis=1)[:, 0]
    angle = fast_atan2(by, bx)
    return jnp.where(angle < 0.0, angle + 2.0 * math.pi, angle)


# --------------------------------------------------------------------------
# MLDB descriptor
# --------------------------------------------------------------------------

class Descriptors(NamedTuple):
    words: jax.Array   # [max_pts, 16] uint32 — 486 bits little-endian


def compute_descriptors(kps: Keypoints, angle, flat: FlatPyramid,
                        plan: PipelinePlan, fixed: bool = False) -> Descriptors:
    """MLDB descriptor (gDescribe2): rotated-window cell means of
    (L, rotated Lx, rotated Ly) over 2x2/3x3/4x4 grids, then 486 pairwise
    comparisons packed to bits."""
    cfg = plan.config
    ms = cfg.max_scale
    l_np, k_np, M_np = _descriptor_window(cfg.descriptor_pattern_size)
    lof = jnp.asarray(l_np, jnp.float32)
    kof = jnp.asarray(k_np, jnp.float32)
    M = jnp.asarray(M_np)
    i1, i2 = _compare_indices()
    i1 = jnp.asarray(i1)
    i2 = jnp.asarray(i2)

    o = jnp.maximum(kps.layer // ms, 0)
    s = kps.layer % ms
    wo = flat.widths[o]
    base = flat.offsets[o] + s * flat.plane[o]
    iratio = 1.0 / (1 << o).astype(jnp.float32)
    scale = (kps.size + 0.5).astype(jnp.int32).astype(jnp.float32)
    xf = kps.x * iratio
    yf = kps.y * iratio
    co = jnp.cos(angle)
    si = jnp.sin(angle)

    # rotated sample positions (akazed.cu:1919-1921); int cast truncates
    xp = (xf[:, None] + scale[:, None]
          * (kof[None, :] * co[:, None] - lof[None, :] * si[:, None])
          + 0.5).astype(jnp.int32)
    yp = (yf[:, None] + scale[:, None]
          * (kof[None, :] * si[:, None] + lof[None, :] * co[:, None])
          + 0.5).astype(jnp.int32)
    pos = base[:, None] + yp * wo[:, None] + xp

    im = flat.L[pos].astype(jnp.float32)
    dx = flat.lx[pos].astype(jnp.float32)
    dy = flat.ly[pos].astype(jnp.float32)
    rx = -dx * si[:, None] + dy * co[:, None]
    ry = dx * co[:, None] + dy * si[:, None]
    if fixed:
        # the fixed kernel truncates the rotated derivatives to int
        # (akazed.cu:3779-3780)
        rx = rx.astype(jnp.int32).astype(jnp.float32)
        ry = ry.astype(jnp.int32).astype(jnp.float32)

    # cell sums on the MXU: [N, S] @ [S, 29] (values are small integers in
    # the fixed path, so f32 accumulation is exact)
    acc_im = jnp.dot(im, M, preferred_element_type=jnp.float32)
    acc_rx = jnp.dot(rx, M, preferred_element_type=jnp.float32)
    acc_ry = jnp.dot(ry, M, preferred_element_type=jnp.float32)
    # flatten to the reference accumulator layout [3*cell + channel]
    acc = jnp.stack([acc_im, acc_rx, acc_ry], axis=2).reshape(
        acc_im.shape[0], -1)  # [N, 87]

    bits = acc[:, i1] > acc[:, i2]  # [N, 486]
    pad = jnp.zeros((bits.shape[0], DESCRIPTOR_WORDS * 32 - DESCRIPTOR_BITS),
                    bool)
    bits512 = jnp.concatenate([bits, pad], axis=1)
    b32 = bits512.reshape(-1, DESCRIPTOR_WORDS, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    words = jnp.sum(b32 << shifts, axis=2, dtype=jnp.uint32)
    return Descriptors(words=words)


def descriptors_to_bytes(words: np.ndarray) -> np.ndarray:
    """Host-side: [N, 16] uint32 -> [N, 61] uint8 (OpenCV-compatible MLDB
    layout, little-endian bit order as in gDescribe2 bit packing)."""
    return np.ascontiguousarray(
        np.asarray(words, dtype="<u4").view(np.uint8).reshape(-1, 64)[:, :61])
