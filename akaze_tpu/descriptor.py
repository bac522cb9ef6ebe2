"""Keypoint orientation and MLDB binary descriptor.

Reference kernels: gCalcOrient (akazed.cu:1665-1736; fixed akazed.cu:3649-3720)
and gDescribe2 (akazed.cu:1869-2001; fixed akazed.cu:3723-3855), with the
comparison-index tables from setCompareIndices (akazed.cu:65-159).

TPU design: TPUs have no fast per-lane gather, so instead of the reference's
per-thread random reads we
  1. extract one [WSIZE, WSIZE] window per keypoint around its (sub-pixel)
     location with a vmapped ``dynamic_slice`` (block transfers);
  2. resolve the sampling patterns *inside* the window with separable
     one-hot matmuls on the MXU (a one-hot row/column select is an exact
     gather expressed as a matrix product);
  3. reduce cell sums with a [N, 441] x [441, 29] membership matmul
     (replacing the warp-shuffle tree reduction, akazed.cu:1958-1983).

All sampling geometry (orientation disc, descriptor grid, cell memberships,
comparison pairs) is static given the config and lives in constant tables.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DESCRIPTOR_BITS, DESCRIPTOR_WORDS
from .detect import Keypoints, PaddedPyramid
from .plan import PipelinePlan

H_PI = math.pi / 2.0

# keypoints per Pallas descriptor kernel block (A/B-tunable).  Must be a
# multiple of 8 (output sublane tiling); 40 also divides the standard
# capacities (10000/4000/2000), so the banded prep's pad-to-block-multiple
# branch (6 ops x ~35 us of flat per-op cost) never fires.  Kernel-side kb
# sweep r5: 16 -> 8.25, 24 -> 8.05, 32 -> 8.18, 40 -> 7.92 ms.
KB = 40

# Window big enough for the worst-case sampling radius:
# descriptor |offset| <= scale * 10 * sqrt(2) + 1.5 <= 58.1 for scale 4
# (sigma_size of the largest sublevel); orientation |offset| <= 5*scale + 1.
WSIZE = 128


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
def _orient_grid():
    """11x11 grid (i, j in [-5, 5]) with the r^2 < 36 disc mask and Gaussian
    weights exp(-r^2 * 0.08) (akazed.cu:1692-1697)."""
    wt = np.zeros((11, 11), np.float32)
    for a in range(11):       # row index -> j (vertical offset)
        for b in range(11):   # col index -> i (horizontal offset)
            j, i = a - 5, b - 5
            r2 = i * i + j * j
            if r2 < 36:
                wt[a, b] = math.exp(-r2 * 0.08)
    return wt


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


@lru_cache(maxsize=None)
def _compare_matrices(dtype_key: str = "f32"):
    """Selection matrices S1, S2 [87, 486] so that bit_t = (acc @ S1)_t >
    (acc @ S2)_t — keeps the comparison gather on the MXU."""
    i1, i2 = _compare_indices()
    s1 = np.zeros((87, DESCRIPTOR_BITS), np.float32)
    s2 = np.zeros((87, DESCRIPTOR_BITS), np.float32)
    s1[i1, np.arange(DESCRIPTOR_BITS)] = 1.0
    s2[i2, np.arange(DESCRIPTOR_BITS)] = 1.0
    return s1, s2


# --------------------------------------------------------------------------
# window extraction
# --------------------------------------------------------------------------

class Windows(NamedTuple):
    L: jax.Array    # [N, WSIZE, WSIZE]
    lx: jax.Array
    ly: jax.Array
    x0: jax.Array   # [N] int32 window origin (octave coords)
    y0: jax.Array


def extract_windows(kps: Keypoints, pp: PaddedPyramid,
                    plan: PipelinePlan) -> Windows:
    """One [WSIZE, WSIZE] window per keypoint, centred on the keypoint in
    its own sublevel plane, clamped to the octave's true extent."""
    ms = plan.config.max_scale
    p = jnp.clip(kps.layer, 0, pp.L.shape[0] - 1)
    o = jnp.maximum(kps.layer // ms, 0)
    iratio = 1.0 / (1 << o).astype(jnp.float32)
    xc = (kps.x * iratio + 0.5).astype(jnp.int32)
    yc = (kps.y * iratio + 0.5).astype(jnp.int32)
    wo = pp.widths[p]
    ho = pp.heights[p]
    x0 = jnp.clip(xc - WSIZE // 2, 0, jnp.maximum(wo - WSIZE, 0))
    y0 = jnp.clip(yc - WSIZE // 2, 0, jnp.maximum(ho - WSIZE, 0))

    def slice_one(stack, pi, yi, xi):
        return jax.lax.dynamic_slice(stack, (pi, yi, xi),
                                     (1, WSIZE, WSIZE))[0]

    grab = jax.vmap(slice_one, in_axes=(None, 0, 0, 0))
    return Windows(L=grab(pp.L, p, y0, x0), lx=grab(pp.lx, p, y0, x0),
                   ly=grab(pp.ly, p, y0, x0), x0=x0, y0=y0)


def _onehot(idx, size: int, dtype):
    """[..., size] one-hot rows; out-of-range indices produce all-zero rows
    (samples of invalid slots read as 0)."""
    lanes = jnp.arange(size, dtype=jnp.int32)
    return (idx[..., None] == lanes).astype(dtype)


# --------------------------------------------------------------------------
# orientation
# --------------------------------------------------------------------------

def compute_orientation(kps: Keypoints, wnd: Windows, plan: PipelinePlan,
                        fixed: bool = False):
    """Dominant orientation per keypoint (gCalcOrient).

    The 11x11 sampling grid (stride = the keypoint's sigma step) is pulled
    from the window with two tiny one-hot matmuls; the 42-bin histogram and
    7-bin circular window scan follow akazed.cu:1692-1734.  Float path uses
    true atan2 for per-sample angles, the fixed kernel the fast polynomial
    (akazed.cu:3685); both use the polynomial for the final angle.
    """
    ms = plan.config.max_scale
    o = jnp.maximum(kps.layer // ms, 0)
    step = (kps.size + 0.5).astype(jnp.int32)
    x = ((kps.x + 0.5).astype(jnp.int32) >> o) - wnd.x0
    y = ((kps.y + 0.5).astype(jnp.int32) >> o) - wnd.y0

    offs = jnp.arange(-5, 6, dtype=jnp.int32)          # [11]
    rows = y[:, None] + step[:, None] * offs[None, :]   # [N, 11]
    cols = x[:, None] + step[:, None] * offs[None, :]
    cdtype = wnd.lx.dtype if wnd.lx.dtype != jnp.int32 else jnp.float32
    row_oh = _onehot(rows, WSIZE, cdtype)               # [N, 11, WSIZE]
    col_oh = _onehot(cols, WSIZE, cdtype)

    def grid_vals(w):
        w = w.astype(cdtype)
        t = jnp.einsum("nrw,nwc->nrc", row_oh, w,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("nrc,nkc->nrk", t, col_oh,
                          preferred_element_type=jnp.float32)  # [N, 11, 11]

    gx = grid_vals(wnd.lx)   # rows index j (vertical), cols index i
    gy = grid_vals(wnd.ly)
    wt = jnp.asarray(_orient_grid())                    # [11, 11]
    dx = (wt[None] * gx).reshape(-1, 121)
    dy = (wt[None] * gy).reshape(-1, 121)
    ang = fast_atan2(dy, dx) if fixed else jnp.arctan2(dy, dx)
    a = jnp.clip((ang * (21.0 / math.pi)).astype(jnp.int32) + 21, 0, 41)
    live = (wt.reshape(-1) > 0)[None, :]

    # 42-bin accumulation (atomicAdd replacement) as one one-hot matmul:
    # [N, 121] @ [N, 121, 42] per-batch contraction on the MXU (an unrolled
    # 42-way masked reduction compiles to a huge HLO and runs 40x the work)
    bin_oh = jnp.where(live[..., None], (a[..., None] == jnp.arange(42))
                       .astype(jnp.float32), 0.0)        # [N, 121, 42]
    resx = jnp.einsum("ns,nsb->nb", dx, bin_oh,
                      preferred_element_type=jnp.float32)
    resy = jnp.einsum("ns,nsb->nb", dy, bin_oh,
                      preferred_element_type=jnp.float32)

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


def compute_descriptors(kps: Keypoints, angle, wnd: Windows,
                        plan: PipelinePlan, fixed: bool = False,
                        chunk: int = 1024) -> Descriptors:
    """MLDB descriptor (gDescribe2): rotated-window cell means of
    (L, rotated Lx, rotated Ly) over 2x2/3x3/4x4 grids, then 486 pairwise
    comparisons packed to bits.

    The 441 rotated nearest-neighbour samples per keypoint are selected with
    separable one-hot matmuls over the window; the work is chunked over
    keypoints to bound the [chunk, 441, WSIZE] intermediates.
    """
    cfg = plan.config
    ms = cfg.max_scale
    l_np, k_np, M_np = _descriptor_window(cfg.descriptor_pattern_size)
    lof = jnp.asarray(l_np, jnp.float32)
    kof = jnp.asarray(k_np, jnp.float32)
    M = jnp.asarray(M_np)
    s1_np, s2_np = _compare_matrices()
    S = jnp.asarray(s1_np - s2_np)  # bit_t = (acc @ S)_t > 0

    o = jnp.maximum(kps.layer // ms, 0)
    iratio = 1.0 / (1 << o).astype(jnp.float32)
    scale = (kps.size + 0.5).astype(jnp.int32).astype(jnp.float32)
    xf = kps.x * iratio - wnd.x0.astype(jnp.float32)
    yf = kps.y * iratio - wnd.y0.astype(jnp.float32)
    co = jnp.cos(angle)
    si = jnp.sin(angle)

    cdtype = wnd.L.dtype if wnd.L.dtype != jnp.int32 else jnp.float32
    n = kps.x.shape[0]
    nchunks = max(1, -(-n // chunk))
    pad_n = nchunks * chunk

    def pad_c(v):
        return jnp.pad(v, [(0, pad_n - n)] + [(0, 0)] * (v.ndim - 1)
                       ).reshape((nchunks, chunk) + v.shape[1:])

    args = jax.tree.map(pad_c, (xf, yf, scale, co, si, wnd.L.astype(cdtype),
                                wnd.lx.astype(cdtype), wnd.ly.astype(cdtype)))

    def do_chunk(a):
        cxf, cyf, csc, cco, csi, wL, wlx, wly = a
        # rotated sample positions (akazed.cu:1919-1921); int cast truncates
        xp = (cxf[:, None] + csc[:, None]
              * (kof[None, :] * cco[:, None] - lof[None, :] * csi[:, None])
              + 0.5).astype(jnp.int32)
        yp = (cyf[:, None] + csc[:, None]
              * (kof[None, :] * csi[:, None] + lof[None, :] * cco[:, None])
              + 0.5).astype(jnp.int32)
        row_oh = _onehot(yp, WSIZE, cdtype)             # [c, 441, WSIZE]
        col_oh = _onehot(xp, WSIZE, cdtype)

        def sample(w):
            t = jnp.einsum("nsy,nyx->nsx", row_oh, w,
                           preferred_element_type=cdtype)
            return jnp.einsum("nsx,nsx->ns", t, col_oh,
                              preferred_element_type=jnp.float32)

        im = sample(wL)
        dx = sample(wlx)
        dy = sample(wly)
        rx = -dx * csi[:, None] + dy * cco[:, None]
        ry = dx * cco[:, None] + dy * csi[:, None]
        if fixed:
            # the fixed kernel truncates the rotated derivatives to int
            # (akazed.cu:3779-3780)
            rx = rx.astype(jnp.int32).astype(jnp.float32)
            ry = ry.astype(jnp.int32).astype(jnp.float32)

        # cell sums on the MXU ([c, 441] @ [441, 29])
        accs = [jnp.dot(v, M, preferred_element_type=jnp.float32)
                for v in (im, rx, ry)]
        acc = jnp.stack(accs, axis=2).reshape(chunk, -1)  # [c, 87]
        diff = jnp.dot(acc, S, preferred_element_type=jnp.float32)
        return diff > 0                                   # [c, 486]

    bits = jax.lax.map(do_chunk, args).reshape(pad_n, DESCRIPTOR_BITS)[:n]
    return Descriptors(words=pack_bits(bits))


def pack_bits(bits):
    """[N, 486] bool -> [N, 16] uint32 little-endian words."""
    n = bits.shape[0]
    pad = jnp.zeros((n, DESCRIPTOR_WORDS * 32 - DESCRIPTOR_BITS), bool)
    bits512 = jnp.concatenate([bits, pad], axis=1)
    b32 = bits512.reshape(-1, DESCRIPTOR_WORDS, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(b32 << shifts, axis=2, dtype=jnp.uint32)


# --------------------------------------------------------------------------
# fused Pallas path (float pipeline, TPU)
# --------------------------------------------------------------------------

# Scale bands for the fused kernel: keypoints are grouped by their integer
# sigma step and each band runs a kernel sized to that band's maximum
# sampling radius (iscale * 10 * sqrt(2) + 1.5), mirroring the reference's
# per-keypoint window sizing (winsize scaling at akazed.cu:1899) without
# dynamic shapes.  Entries: (max_iscale, wy, wx, logical_y, logical_x); the
# DMA'd window is logical extent + tile-alignment slack (8 rows, 128 cols).
#
# MEASURED (v5e, stock pair, benchmarks/band_profile.py): multi-band is a
# NET LOSS here — 5.32 ms (72/104/128 bands) vs 4.89 ms single-band.  Two
# reasons: (a) the DMA lane extent must be whole 128-lane tiles with a
# tile-aligned origin, so the x window cannot shrink below logical_x + 127
# rounded to 256 — only the y extent bands, and the kernel's cost is
# dominated by lane-dimension VPU work + per-grid-step overhead, not by
# DMA rows; (b) each extra band kernel re-walks the full slot grid (dead
# steps cost ~0.5 us each).  The default is therefore ONE band; the
# multi-band machinery stays available (and tested) for hardware where the
# tradeoff differs.
_SCALE_BANDS = (
    (10 ** 9, 128, 256, 120, 128),  # radius <= 59 (scale 4, WSIZE design)
)
_SCALE_BANDS_3 = (
    (2, 72, 256, 64, 64),      # radius <= 2*14.15 + 1  ~= 30
    (3, 104, 256, 96, 96),     # radius <= 3*14.15 + 1  ~= 44
    (10 ** 9, 128, 256, 120, 128),
)


def _band_kp_cols(kps: Keypoints, pp: PaddedPyramid, plan: PipelinePlan,
                  ly: int, lx: int, plane_base: int = 0,
                  nplanes: int = None, row_off=None):
    """Column form of ``_band_kp_params``: returns the per-keypoint fields
    as separate 1D arrays (p, y0, x0, oy, ox, iscale, yc, xc) — the banded
    path consumes columns directly (stacking them into an [N, k] table is
    a measured cross-lane relayout)."""
    ms = plan.config.max_scale
    if nplanes is None:
        nplanes = pp.L.shape[0]
    p = jnp.clip(kps.layer, 0, nplanes - 1) + plane_base
    o = jnp.maximum(kps.layer // ms, 0)
    off = (jnp.zeros_like(o) if row_off is None
           else row_off[o].astype(jnp.int32))
    iratio = 1.0 / (1 << o).astype(jnp.float32)
    xc = (kps.x * iratio + 0.5).astype(jnp.int32)
    yc = (kps.y * iratio + 0.5).astype(jnp.int32) + off
    wo = pp.widths[p]
    ho = pp.heights[p]
    xi = (kps.x + 0.5).astype(jnp.int32) >> o
    yi = ((kps.y + 0.5).astype(jnp.int32) >> o) + off
    iscale = (kps.size + 0.5).astype(jnp.int32)
    x0 = jnp.clip(xc - lx // 2, 0, jnp.maximum(wo - lx, 0))
    y0 = jnp.clip(yc - ly // 2, 0, jnp.maximum(ho - ly, 0))
    return (p, y0, x0, yi - y0, xi - x0, iscale,
            kps.y * iratio - (y0 - off).astype(jnp.float32),
            kps.x * iratio - x0.astype(jnp.float32))


def _band_kp_params(kps: Keypoints, pp: PaddedPyramid, plan: PipelinePlan,
                    ly: int, lx: int, plane_base: int = 0,
                    nplanes: int = None, row_off=None):
    """iparams/fparams for the fused kernel, window origin centred for a
    (ly, lx) logical window (x clamps exactly like extract_windows;
    sampling positions are absolute so the origin choice is value-neutral).

    ``plane_base``/``nplanes``: when ``pp`` stacks several images'
    pyramids (pair batching), the planes of this keypoint set start at
    ``plane_base`` and the per-image plane count is ``nplanes``.

    ``row_off``: optional [noctaves] int32 per-octave row offset of the
    pyramid planes vs global octave rows (the spatial tier's halo-extended
    shards).  Applied in the INTEGER domain — yc/yi shift exactly and the
    window-relative float center subtracts the globalized origin, which
    stays within the window of ``kps.y * iratio`` so the subtraction is
    exact — shifting the float ``kps.y`` itself could drop mantissa bits
    and flip the +-0.5 roundings."""
    p, y0, x0, oy, ox, iscale, ycf, xcf = _band_kp_cols(
        kps, pp, plan, ly, lx, plane_base, nplanes, row_off)
    zero_i = jnp.zeros_like(p)
    ip = jnp.stack([p, y0, x0, oy, ox, iscale, zero_i, zero_i], axis=1)
    fp = jnp.stack([ycf, xcf, iscale.astype(jnp.float32),
                    jnp.zeros_like(ycf)], axis=1)
    return ip, fp


def _banded_prep(kps_list, pp: PaddedPyramid, plan: PipelinePlan,
                 kb: int, hp2: int, wpl: int, nplanes: int = None,
                 row_off=None, plane_base0: int = 0):
    """In-graph block/band assignment for the banded-window kernel.

    Sorts the keypoint slots by (plane, aligned window row), chunks them
    into kb-blocks, and classifies each block: banded (all windows fit one
    [BH, wpl] row band of one plane — band origin on the 128-row grid so
    consecutive blocks share it) or parked (plane transitions / sparse
    row spans: per-keypoint window DMAs into the band buffer's parking
    grid).  Measured on the stock pair this puts ~98% of blocks on shared
    bands (~70 bands + ~30 parked blocks, ~210 MB/pair vs 1.58 GB of
    private windows).  All outputs are per-SORTED-slot; ``rank`` maps an
    original slot to its sorted position for ungathering the kernel
    outputs.  Sampling positions are absolute, so the reorder cannot
    change any sampled value.

    Takes the whole image LIST at once: one multi-payload sort covers
    every image's segment (per-op cost is flat, so two sorts cost twice
    one), with per-image invalid-slot sentinel keys chosen to keep each
    segment contiguous under the global sort (invalids sort to the end of
    THEIR image's key range, below the next image's first plane key).
    Requires each segment length to be a multiple of kb so blocks never
    straddle images (the launcher falls back to capacity padding
    otherwise).

    Returns ((w1, w2) int32, (yc, xc) f32, (bw,) int32 with the slot bit
    left 0 — the launcher assigns slots globally, rank [n_total] int32
    mapping original global slots to sorted positions).
    """
    from .ops.pallas_describe import BH

    # OP-COUNT discipline (measured, v5e device trace): on this hardware
    # every unfused HLO op costs ~30-40 us REGARDLESS of size at these
    # shapes, so the prep is written for minimum op count, not minimum
    # FLOPs: one multi-payload sort carries every per-keypoint field, the
    # block statistics are two gathers of ONE packed word (within a block
    # of one plane, sorted y0a is non-decreasing, so min/max are the
    # first/last elements), the per-keypoint block broadcast is one gather
    # of another packed word, and everything else is elementwise (fuses).
    # The first stacked-table implementation of this prep added 41 fusions
    # = +1.7 ms to the pair program; this form adds ~9.  Reshapes to
    # [S, kb] / jnp.repeat are also out: they are cross-lane relayouts.
    import numpy as _np

    if nplanes is None:
        nplanes = pp.L.shape[0] // len(kps_list)
    cols = [_band_kp_cols(kps, pp, plan, 120, 128,
                          plane_base=plane_base0 + i * nplanes,
                          nplanes=nplanes, row_off=row_off)
            for i, kps in enumerate(kps_list)]
    if len(cols) == 1:
        p, y0, x0, oy, ox, iscale, ycf, xcf = cols[0]
        valid = kps_list[0].valid
    else:
        p, y0, x0, oy, ox, iscale, ycf, xcf = (
            jnp.concatenate(c) for c in zip(*cols))
        valid = jnp.concatenate([k.valid for k in kps_list])
        assert all(k.x.shape[0] % kb == 0 for k in kps_list), \
            "batched prep needs kb-aligned segments"
    n = p.shape[0]
    # per-image invalid-slot sentinel: the largest key below the next
    # image's plane range, so each image's invalid slots sort to the end
    # of ITS OWN segment (a global sentinel would interleave segments)
    inv_key = jnp.asarray(_np.concatenate(
        [_np.full(k.x.shape[0],
                  (plane_base0 + (i + 1) * nplanes) * 256 - 1, _np.int32)
         for i, k in enumerate(kps_list)]))
    sy, sx = y0 % 8, x0 % 128
    y0a, x0a = y0 - sy, x0 - sx

    key = jnp.where(valid, p * 256 + y0a // 8, inv_key)
    # cls packs (plane, y0a) for block stats; invalid slots poison it so
    # any block containing one classifies as parked (its valid members
    # then DMA their own windows; a band fit judged on garbage stats
    # could read outside the band for a REAL keypoint)
    cls = jnp.where(valid, p * (1 << 20) + y0a, jnp.int32(1 << 30))
    w1p = jnp.where(valid,
                    p + (y0a // 8) * 64 + (x0a // 128) * (1 << 16), 0)
    w2 = (oy + sy + 256) + (ox + sx + 256) * 1024 + iscale * (1 << 20)
    yc = ycf + sy.astype(jnp.float32)
    xc = xcf + sx.astype(jnp.float32)
    iota = jnp.arange(n, dtype=jnp.int32)
    (key_s, cls_s, w1p_s, y0a_s, x0a_s, w2_s, yc_s, xc_s,
     perm) = jax.lax.sort(
        [key, cls, w1p, y0a, x0a, w2, yc, xc, iota], num_keys=1)
    rank = jnp.zeros(n, jnp.int32).at[perm].set(iota)  # inverse of perm

    rem = (-n) % kb
    if rem:
        def padi(v, fill=0):
            return jnp.pad(v, (0, rem), constant_values=fill)

        cls_s = padi(cls_s, 1 << 30)
        w1p_s, y0a_s, x0a_s, w2_s = map(padi, (w1p_s, y0a_s, x0a_s, w2_s))
        yc_s = padi(yc_s, 0.0)
        xc_s = padi(xc_s, 0.0)
    npad = n + rem
    S = npad // kb

    first = jnp.arange(S, dtype=jnp.int32) * kb
    cfirst = cls_s[first]
    clast = cls_s[first + kb - 1]
    live = cfirst < (1 << 30)
    p0 = cfirst >> 20
    bandy = jnp.clip(((cfirst % (1 << 20)) // 128) * 128, 0, hp2 - BH)
    banded = ((p0 == (clast >> 20))
              & (clast % (1 << 20) <= bandy + BH - 128) & live)

    def prev(v, fill):
        return jnp.concatenate([jnp.full((1,), fill, v.dtype), v[:-1]])

    same_prev = (banded & prev(banded, False) & (bandy == prev(bandy, -1))
                 & (p0 == prev(p0, -1)))
    btype = jnp.where(~live, 0,
                      jnp.where(same_prev, 0, jnp.where(banded, 1, 2)))
    bw = (btype + live.astype(jnp.int32) * 4
          + jnp.clip(p0, 0, 63) * 16 + (bandy // 8) * 1024)

    # per-keypoint side: ONE gather of a packed (banded, bandy) word
    blkw = bandy + banded.astype(jnp.int32) * (1 << 20)
    g = blkw[jnp.arange(npad, dtype=jnp.int32) // kb]
    use_band = (g >= (1 << 20)) & (cls_s < (1 << 30))
    w1 = jnp.where(use_band,
                   (y0a_s - g % (1 << 20)) // 8 + (x0a_s // 128) * 64,
                   w1p_s)
    return (w1, w2_s), (yc_s, xc_s), (bw,), rank


def _banded_pyramid(pp: PaddedPyramid, slack=(0, 0), dtype=jnp.bfloat16):
    """Plane stacks padded for the banded kernel: >= BH rows (whole-band
    DMAs near the bottom clamp to hp2 - BH) and a 128-multiple width (the
    band DMA covers all wpl lanes and planes sit wpl lanes apart in the
    band buffer).  Zero-copy at the stock shape (968 x 1408)."""
    from .ops.pallas_describe import BH

    planes = (pp.L, pp.lx, pp.ly)
    hp, wp = planes[0].shape[1], planes[0].shape[2]
    hp2 = max(hp + max(8 - slack[0], 0), BH)
    hp2 += (-hp2) % 8
    wp2 = max(wp + max(128 - slack[1], 0), 256)
    wp2 += (-wp2) % 128
    pad = ((0, 0), (0, hp2 - hp), (0, wp2 - wp))

    def prep(x):
        x = x.astype(dtype)
        if hp2 != hp or wp2 != wp:
            x = jnp.pad(x, pad)
        return x

    return tuple(prep(x) for x in planes), hp2, wp2


def orient_describe_pallas_banded_multi(kps_list, pp: PaddedPyramid,
                                        plan: PipelinePlan,
                                        interpret: bool = False,
                                        slack=(0, 0), fixed: bool = False,
                                        row_off=None):
    """ONE banded-window fused-kernel launch over several images' keypoint
    sets (the round-5 window-delivery architecture; see
    ops/pallas_describe._make_banded_kernel).  Output values are
    bit-identical to ``orient_describe_pallas_multi``; only the window
    DMA traffic differs."""
    from .ops.pallas_describe import orient_describe_banded

    cfg = plan.config
    nimg = len(kps_list)
    nplanes = pp.L.shape[0] // nimg
    planes, hp2, wpl = _banded_pyramid(
        pp, slack, dtype=jnp.float32 if fixed else jnp.bfloat16)
    segs = [k.x.shape[0] for k in kps_list]
    if all(s % KB == 0 for s in segs):
        # one batched prep for ALL images (one sort, one scatter — per-op
        # cost is flat, so per-image preps cost nimg times as much)
        ikp_all, fkp_all, (bw,), rank = _banded_prep(
            kps_list, pp, plan, KB, hp2, wpl, nplanes=nplanes,
            row_off=row_off)
        ranks = [rank[sum(segs[:i]):sum(segs[:i + 1])]
                 for i in range(nimg)]
        seg_out = [0] * nimg       # rank is GLOBAL: no per-segment offset
    else:
        # capacity not block-aligned: per-image preps (pads internally)
        ips, fps, bps, ranks = [], [], [], []
        for i, kps in enumerate(kps_list):
            ikp, fkp, blkp, rank = _banded_prep(
                [kps], pp, plan, KB, hp2, wpl, nplanes=nplanes,
                row_off=row_off, plane_base0=i * nplanes)
            ips.append(ikp)
            fps.append(fkp)
            bps.append(blkp)
            ranks.append(rank)
        cat = (lambda cols: tuple(jnp.concatenate(c) for c in zip(*cols)))
        ikp_all = cat(ips)
        fkp_all = cat(fps)
        (bw,) = cat(bps)
        seg_out = []
        off = 0
        for ik in ips:
            seg_out.append(off)
            off += ik[0].shape[0]
    # band-slot assignment is GLOBAL (the double buffer flips on every DMA
    # event, including across image-segment boundaries); slot lives at
    # bit 3 of the packed block word
    slot = jnp.clip(jnp.cumsum((bw % 4 > 0).astype(jnp.int32)) - 1, 0) % 2
    bw = bw + slot * 8
    angle, acc = orient_describe_banded(
        ikp_all, fkp_all, (bw,), planes,
        patsize=cfg.descriptor_pattern_size, kb=KB, wpl=wpl,
        interpret=interpret, fixed=fixed)
    angle_all, desc_all = _finish_descriptors(angle, acc)
    out = []
    for i in range(nimg):
        r = ranks[i] + seg_out[i]
        out.append((angle_all[r], Descriptors(words=desc_all.words[r])))
    return out


def orient_describe_pallas_multi(kps_list, pp: PaddedPyramid,
                                 plan: PipelinePlan,
                                 interpret: bool = False, slack=(0, 0),
                                 fixed: bool = False, row_off=None):
    """ONE fused-kernel launch over several images' keypoint sets.

    ``pp`` stacks the images' padded pyramids along the plane axis
    (build_padded_pyramid over the concatenated octave lists); each
    keypoint set's slot segment is padded to a kernel-block multiple so
    per-block liveness skipping stays correct (liveness is valid-prefix
    *per segment*, and a segment must therefore start on a block
    boundary).  Halves per-launch fixed cost + dead grid steps vs one
    launch per image (r2 verdict: pair-batched headline push).

    Returns a list of (angle [N], Descriptors) per keypoint set.
    """
    from .ops.pallas_describe import orient_describe

    cfg = plan.config
    if cfg.banded_windows:
        return orient_describe_pallas_banded_multi(
            kps_list, pp, plan, interpret, slack, fixed, row_off)
    assert len(_SCALE_BANDS) == 1, "pair batching supports the single-band layout"
    _, wy, wx, ly, lx = _SCALE_BANDS[0]
    nimg = len(kps_list)
    nplanes = pp.L.shape[0] // nimg
    ips, fps = [], []
    for i, kps in enumerate(kps_list):
        ip, fp = _band_kp_params(kps, pp, plan, ly, lx,
                                 plane_base=i * nplanes, nplanes=nplanes,
                                 row_off=row_off)
        ip = ip.at[:, 6].set(kps.valid.astype(jnp.int32))
        rem = (-ip.shape[0]) % KB
        if rem:
            ip = jnp.pad(ip, ((0, rem), (0, 0)))
            fp = jnp.pad(fp, ((0, rem), (0, 0)))
        ips.append(ip)
        fps.append(fp)
    seg = [ip.shape[0] for ip in ips]
    pyramid = _padded_band_pyramid(
        pp, wy, wx, slack,
        dtype=jnp.float32 if fixed else jnp.bfloat16)
    angle, acc = orient_describe(
        jnp.concatenate(ips), jnp.concatenate(fps), pyramid,
        patsize=cfg.descriptor_pattern_size, kb=KB, interpret=interpret,
        wy=wy, wx=wx, fixed=fixed)
    angle_all, desc_all = _finish_descriptors(angle, acc)
    out = []
    off = 0
    for i, kps in enumerate(kps_list):
        n = kps.x.shape[0]
        out.append((angle_all[off:off + n],
                    Descriptors(words=desc_all.words[off:off + n])))
        off += seg[i]
    return out


def orient_describe_pallas(kps: Keypoints, pp: PaddedPyramid,
                           plan: PipelinePlan, interpret: bool = False,
                           slack=(0, 0), fixed: bool = False,
                           row_off=None):
    """Orientation + MLDB descriptor via the fused Pallas kernel
    (ops/pallas_describe.py); numerically equivalent to
    compute_orientation + compute_descriptors on the float path up to
    bf16 window sampling.

    Keypoints are compacted into scale bands (valid-prefix per band via one
    argsort + rolls) and each band runs a window-sized kernel; sampling
    positions are absolute, so the band geometry does not change any
    sampled value — only how much dead window each keypoint pays for.

    Returns (angle [N], Descriptors).
    """
    from .ops.pallas_describe import orient_describe

    cfg = plan.config
    n = kps.x.shape[0]

    def band_params(ly: int, lx: int):
        return _band_kp_params(kps, pp, plan, ly, lx)

    kb = KB
    rem = (-n) % kb
    n_bands = len(_SCALE_BANDS)

    if n_bands == 1:
        # fast path: no grouping machinery (measured ~0.4 ms of sort/
        # roll/recombine at N=10k that a single band does not need) —
        # exactly the one-segment case of the pair-batched launcher
        return orient_describe_pallas_multi([kps], pp, plan, interpret,
                                            slack, fixed, row_off)[0]

    # group keypoints by band with a stable counting sort (cumsum ranks —
    # no argsort); invalid slots group last (band id past every real band)
    iscale = (kps.size + 0.5).astype(jnp.int32)
    band = jnp.full(n, n_bands, jnp.int32)
    for b in range(n_bands - 1, -1, -1):
        band = jnp.where(iscale <= _SCALE_BANDS[b][0], b, band)
    band = jnp.where(kps.valid, band, n_bands)
    onehots = (band[:, None] == jnp.arange(n_bands + 1)[None, :]
               ).astype(jnp.int32)                        # [n, B+1]
    rank = (jnp.take_along_axis(jnp.cumsum(onehots, axis=0),
                                band[:, None], axis=1)[:, 0] - 1)
    counts_all = jnp.sum(onehots, axis=0)                 # [B+1]
    offsets_all = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(counts_all)[:-1]])
    pos = offsets_all[band] + rank        # sorted position of each slot
    # perm: sorted[j] = orig[perm[j]]; its inverse is pos itself
    perm = jnp.zeros(n, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32))
    band_sorted = band[perm]
    counts = counts_all[:n_bands]
    offsets = offsets_all[:n_bands]

    wy_max = max(bd[1] for bd in _SCALE_BANDS)
    wx_max = max(bd[2] for bd in _SCALE_BANDS)
    pyramid = _padded_band_pyramid(
        pp, wy_max, wx_max, slack,
        dtype=jnp.float32 if fixed else jnp.bfloat16)

    slot_iota = jnp.arange(n + rem, dtype=jnp.int32)
    angle = jnp.zeros(n, jnp.float32)
    acc = jnp.zeros((n, 87), jnp.float32)
    for b, (_, wy, wx, ly, lx) in enumerate(_SCALE_BANDS):
        ip, fp = band_params(ly, lx)
        # compact band b to a valid prefix: sort, rotate its segment to the
        # front, and flag exactly its count live (the kernel's block
        # skipping then scales work with the band's population)
        ip_b = jnp.roll(ip[perm], -offsets[b], axis=0)
        fp_b = jnp.roll(fp[perm], -offsets[b], axis=0)
        if rem:
            ip_b = jnp.pad(ip_b, ((0, rem), (0, 0)))
            fp_b = jnp.pad(fp_b, ((0, rem), (0, 0)))
        live = (slot_iota < counts[b]).astype(jnp.int32)
        ip_b = ip_b.at[:, 6].set(live)
        ang_b, acc_b = orient_describe(
            ip_b, fp_b, pyramid, patsize=cfg.descriptor_pattern_size,
            kb=kb, interpret=interpret, wy=wy, wx=wx, zero_dead=False,
            fixed=fixed)
        ang_u = jnp.roll(ang_b[:n], offsets[b], axis=0)
        acc_u = jnp.roll(acc_b[:n], offsets[b], axis=0)
        sel = band_sorted == b
        angle = jnp.where(sel, ang_u, angle)
        acc = jnp.where(sel[:, None], acc_u, acc)
    # back to original keypoint order (pos is perm's inverse)
    angle = angle[pos]
    acc = acc[pos]
    return _finish_descriptors(angle, acc)


def _padded_band_pyramid(pp: PaddedPyramid, wy: int, wx: int,
                         slack=(0, 0), dtype=jnp.bfloat16):
    """Three [P, Hp, Wp] plane stacks (L, Lx, Ly; ``dtype``, bf16 default
    / f32 for the bit-faithful fixed flavour), padded so every
    tile-aligned window DMA (rounded-down origins overhang by up to
    (8, 128)) stays in bounds.

    ``slack``: (rows, cols) of overhang padding the planes already carry
    (build_padded_pyramid's ``extra``) — with (8, 128) prebaked and
    already-converted planes this is a zero-copy pass-through."""
    planes = (pp.L, pp.lx, pp.ly)
    hp, wp = planes[0].shape[1], planes[0].shape[2]
    hp2 = max(hp + max(8 - slack[0], 0), wy)
    wp2 = max(wp + max(128 - slack[1], 0), wx)
    pad = ((0, 0), (0, hp2 - hp), (0, wp2 - wp))

    def prep(x):
        x = x.astype(dtype)
        if hp2 != hp or wp2 != wp:
            x = jnp.pad(x, pad)
        return x

    return tuple(prep(x) for x in planes)


def _finish_descriptors(angle, acc):
    s1_np, s2_np = _compare_matrices()
    S = jnp.asarray(s1_np - s2_np)           # [87, 486]
    diff = jnp.dot(acc, S, preferred_element_type=jnp.float32)
    return angle, Descriptors(words=pack_bits(diff > 0))


def descriptors_to_bytes(words: np.ndarray) -> np.ndarray:
    """Host-side: [N, 16] uint32 -> [N, 61] uint8 (OpenCV-compatible MLDB
    layout, little-endian bit order as in gDescribe2 bit packing)."""
    return np.ascontiguousarray(
        np.asarray(words, dtype="<u4").view(np.uint8).reshape(-1, 64)[:, :61])
