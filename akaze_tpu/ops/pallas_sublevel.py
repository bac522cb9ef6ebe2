"""Fused Pallas TPU kernel: one nonlinear scale-space sublevel per pass.

The XLA scale space runs ~8 stencil ops per sublevel (sigma-1 smooth,
Scharr flow, N FED diffusion steps, scaled first derivatives, Hessian
determinant), each materialising full-resolution intermediates in HBM —
~80 MB of traffic per 1.2 MPix sublevel.  This kernel streams row blocks
through VMEM once: a block plus its stencil halo is DMA'd in
(double-buffered), every stage runs on-chip with static lane/sublane
rolls, and only the four result planes (L, det, Lx, Ly) leave.

Semantics mirror ops/conv.py, ops/diffusion.py and ops/scharr.py
expression-for-expression (reference kernels: gConv2dR2 akazed.cu:205-356,
gFlowNaive akazed.cu:1068-1107, gNldStepNaive akazed.cu:1241-1264,
gDerivate akazed.cu:1267-1296, gHessianDeterminant akazed.cu:1299-1331).
Reflect-101 borders come from a pre-padded input: the halo carries
mirrored values, and diffusing a mirrored field evolves the halo exactly
like the reflect-indexed interior computation, so L/Lx/Ly match the
unfused ops everywhere and det matches on the interior (to FMA
contraction noise, ~4e-7).  Inside the <= 2*step+2 border band det uses
the analytic continuation of Lx/Ly where the XLA op reflect-pads the
derivative plane (sign flip for an odd function) — a band that lies
strictly inside the extrema-search border (smax * sigma_size >= 28 px),
so detection results are unaffected.

Float path and the 16.16 fixed-point path (``fixed=True``: int adds/
shifts for conv+FED, float conductivity stored x65536 as
akazed.cu:3432-3445), all four diffusivities (expression order matches
ops/diffusion.py:_conductivity_from_dif2).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Diffusivity
from .conv import gauss_half_kernel
from .scharr import SCHARR_FAC1, SCHARR_FAC2


def _halo_for(step: int, n_taus: int, smooth_radius: int = 2) -> int:
    """Vertical/horizontal stencil reach of one fused sublevel:
    det needs smooth +-2*step (two dilated derivative passes) and smooth
    needs the input +-smooth_radius; the FED chain needs flow +-(n-1) ->
    smooth +-n -> input +-(n + smooth_radius + 1)."""
    reach = max(2 * step + smooth_radius, n_taus + smooth_radius + 1)
    return -(-reach // 8) * 8  # sublane-aligned


def _roll_x(x, off: int):
    """x shifted so lane l reads source lane l + off (static)."""
    if off == 0:
        return x
    n = x.shape[1]
    return pltpu.roll(x, (-off) % n, axis=1)


def _roll_y(x, off: int):
    if off == 0:
        return x
    n = x.shape[0]
    return pltpu.roll(x, (-off) % n, axis=0)


def _shift(x, dy: int, dx: int):
    return _roll_y(_roll_x(x, dx), dy)


def _sep_conv(x, k):
    """Separable Gaussian (any radius), identical expression order to
    ops/conv.py:_row_pass/_col_pass."""
    r = len(k) - 1
    row = k[0] * x
    for i in range(1, r + 1):
        row = row + k[i] * (_roll_x(x, -i) + _roll_x(x, i))
    out = k[0] * row
    for i in range(1, r + 1):
        out = out + k[i] * (_roll_y(row, -i) + _roll_y(row, i))
    return out


def _sep_conv_fixed(x, k):
    """16.16 separable Gaussian with the reference's per-pass truncation
    (ops/conv.py:sep_conv2d_fixed; akazed.cu:2812-2850): horizontal pass,
    >>16, vertical pass, >>16."""
    r = len(k) - 1
    row = k[0] * x
    for i in range(1, r + 1):
        row = row + k[i] * (_roll_x(x, -i) + _roll_x(x, i))
    row = row >> 16
    out = k[0] * row
    for i in range(1, r + 1):
        out = out + k[i] * (_roll_y(row, -i) + _roll_y(row, i))
    return out >> 16


def _scharr_xy(x, step: int):
    """Unnormalized Scharr gradients (ops/scharr.py:scharr_gradient_xy)."""
    def v(dy, dx):
        return _shift(x, dy * step, dx * step)

    dx = 10 * (v(0, 1) - v(0, -1)) + 3 * (v(-1, 1) + v(1, 1)
                                          - v(-1, -1) - v(1, -1))
    dy = 10 * (v(1, 0) - v(-1, 0)) + 3 * (v(1, -1) + v(1, 1)
                                          - v(-1, -1) - v(-1, 1))
    return dx, dy


def _scaled_deriv(x, step: int):
    """ops/scharr.py:scaled_derivatives expression order."""
    f1 = float(np.float32(SCHARR_FAC1))
    f2 = float(np.float32(SCHARR_FAC2))

    def v(dy, dx):
        return _shift(x, dy * step, dx * step)

    lx = f1 * (v(-1, 1) + v(1, 1) - v(-1, -1) - v(1, -1)) \
        + f2 * (v(0, 1) - v(0, -1))
    ly = f1 * (v(1, 1) + v(1, -1) - v(-1, 1) - v(-1, -1)) \
        + f2 * (v(1, 0) - v(-1, 0))
    return lx, ly


def _nld_step(img, flow, tau: float):
    """ops/diffusion.py:nld_step expression order."""
    step = ((flow + _shift(flow, 0, 1)) * (_shift(img, 0, 1) - img)
            + (flow + _shift(flow, 0, -1)) * (_shift(img, 0, -1) - img)
            + (flow + _shift(flow, 1, 0)) * (_shift(img, 1, 0) - img)
            + (flow + _shift(flow, -1, 0)) * (_shift(img, -1, 0) - img))
    return img + float(np.float32(0.5) * np.float32(tau)) * step


def _nld_step_fixed(img, flow, tau: float):
    """ops/diffusion.py:nld_step_fixed (akazed.cu:3449-3473): int32
    neighbourhood sum >>16, times the 16.16 step factor, >>16."""
    sf = np.float32(0.5) * np.float32(tau) * np.float32(65536) \
        + np.float32(0.5)
    stepfac = int(np.int32(sf))
    step = ((flow + _shift(flow, 0, 1)) * (_shift(img, 0, 1) - img)
            + (flow + _shift(flow, 0, -1)) * (_shift(img, 0, -1) - img)
            + (flow + _shift(flow, 1, 0)) * (_shift(img, 1, 0) - img)
            + (flow + _shift(flow, -1, 0)) * (_shift(img, -1, 0) - img)) >> 16
    return ((stepfac * step) >> 16) + img


def _scaled_deriv_fixed(x, step: int):
    """ops/scharr.py:scaled_derivatives_fixed (16.16 factors, >>16)."""
    from .scharr import SCHARR_IFAC1, SCHARR_IFAC2

    def v(dy, dx):
        return _shift(x, dy * step, dx * step)

    lx = (SCHARR_IFAC1 * (v(-1, 1) + v(1, 1) - v(-1, -1) - v(1, -1))
          + SCHARR_IFAC2 * (v(0, 1) - v(0, -1))) >> 16
    ly = (SCHARR_IFAC1 * (v(1, 1) + v(1, -1) - v(-1, 1) - v(-1, -1))
          + SCHARR_IFAC2 * (v(1, 0) - v(-1, 0))) >> 16
    return lx, ly


def _flow_from_dif2(dif2, diffusivity: Diffusivity):
    """Conductivity, expression-for-expression as
    ops/diffusion.py:_conductivity_from_dif2 (gFlowNaive's four flavours,
    akazed.cu:1091-1106)."""
    if diffusivity == Diffusivity.PM_G1:
        return jnp.exp(-dif2)
    if diffusivity == Diffusivity.PM_G2:
        return 1.0 / (1.0 + dif2)
    if diffusivity == Diffusivity.WEICKERT:
        return 1.0 - jnp.exp(-3.315 / (dif2 ** 4))
    return 1.0 / jnp.sqrt(1.0 + dif2)


def _make_kernel(taus, step: int, bh: int, halo: int, wp: int,
                 n_blocks: int, smooth_outside: bool,
                 smooth_var: float = 1.0, smooth_radius: int = 2,
                 first_sublevel: bool = False,
                 diffusivity: Diffusivity = Diffusivity.PM_G2,
                 fixed: bool = False, batch: int = 1):
    """``batch`` > 1: the grid is linear over batch * n_blocks and the
    source/smooth refs carry a leading image axis — one launch walks every
    image's row blocks back to back (pair batching halves the per-launch
    fixed cost of the 2x16 sublevel launches per stock pair)."""
    rows = bh + 2 * halo
    if fixed:
        from .conv import gauss_half_kernel_fixed
        k = gauss_half_kernel_fixed(smooth_var, smooth_radius)
    else:
        k = tuple(float(np.float32(v))
                  for v in gauss_half_kernel(smooth_var, smooth_radius))

    def kernel(ikc_ref,      # prefetch [batch] f32: 1 / kcontrast^2 (SMEM)
               src_ref,      # [Hp, wp] ([batch, Hp, wp]) f32 padded L_prev
               sm_ref,       # [Hp, wp] ([batch, Hp, wp]) f32 padded smooth
               #               (only read when smooth_outside)
               L_ref,        # out [bh, wp] ([1, bh, wp]) f32
               det_ref,      # out [bh, wp] ([1, bh, wp]) f32
               lx_ref,       # out [bh, wp] ([1, bh, wp]) f32
               ly_ref,       # out [bh, wp] ([1, bh, wp]) f32
               buf,          # scratch [2, rows, wp] f32 (src)
               sbuf,         # scratch [2, rows, wp] f32 (smooth, if used)
               sems):        # DMA [2, 2]
        blk = pl.program_id(0)

        def dma(slot, lin, which):
            ref = src_ref if which == 0 else sm_ref
            dst = buf if which == 0 else sbuf
            if batch == 1:
                rs = pl.ds(pl.multiple_of(lin * bh, 8), rows)
                sl = ref.at[rs, :]
            else:
                img = lin // n_blocks
                b = lin - img * n_blocks
                rs = pl.ds(pl.multiple_of(b * bh, 8), rows)
                sl = ref.at[img, rs, :]
            return pltpu.make_async_copy(sl, dst.at[slot],
                                         sems.at[slot, which])

        n_in = 2 if smooth_outside else 1

        @pl.when(blk == 0)
        def _():
            for w in range(n_in):
                dma(0, 0, w).start()

        @pl.when(blk + 1 < batch * n_blocks)
        def _():
            for w in range(n_in):
                dma((blk + 1) % 2, blk + 1, w).start()

        slot = blk % 2
        for w in range(n_in):
            dma(slot, blk, w).wait()

        src = buf[slot]
        if smooth_outside:
            smooth = sbuf[slot]
        elif fixed:
            smooth = _sep_conv_fixed(src, k)
        else:
            smooth = _sep_conv(src, k)

        if taus:
            # conductivity flow (gFlowNaive; fixed: int Scharr, float
            # conductivity stored x65536 rounded, akazed.cu:3432-3445)
            ikc = ikc_ref[0] if batch == 1 else ikc_ref[blk // n_blocks]
            gx, gy = _scharr_xy(smooth, 1)
            if fixed:
                dif2 = (gx * gx + gy * gy).astype(jnp.float32) * ikc
                flow = (_flow_from_dif2(dif2, diffusivity)
                        * 65536 + 0.5).astype(jnp.int32)
            else:
                dif2 = ikc * (gx * gx + gy * gy)
                flow = _flow_from_dif2(dif2, diffusivity)

            # FED chain (halo shrinks one row/col per step; outputs stay
            # valid because halo >= n_taus + smooth_radius)
            L = src
            for tau in taus:
                L = (_nld_step_fixed if fixed else _nld_step)(L, flow, tau)
        else:
            # first sublevel: L IS the base smooth (akaze.cpp:325-332);
            # zero-tau interior sublevels keep the source unchanged
            L = smooth if first_sublevel else src

        # Hessian determinant (same dilated stencil on lx/ly)
        if fixed:
            from .scharr import SCHARR_IFAC1 as f1, SCHARR_IFAC2 as f2
            lx, ly = _scaled_deriv_fixed(smooth, step)
        else:
            f1 = float(np.float32(SCHARR_FAC1))
            f2 = float(np.float32(SCHARR_FAC2))
            lx, ly = _scaled_deriv(smooth, step)

        def v(a, dy, dx):
            return _shift(a, dy * step, dx * step)

        dxx = f1 * (v(lx, -1, 1) + v(lx, 1, 1) - v(lx, -1, -1)
                    - v(lx, 1, -1)) + f2 * (v(lx, 0, 1) - v(lx, 0, -1))
        dxy = f1 * (v(lx, 1, 1) + v(lx, 1, -1) - v(lx, -1, 1)
                    - v(lx, -1, -1)) + f2 * (v(lx, 1, 0) - v(lx, -1, 0))
        dyy = f1 * (v(ly, 1, 1) + v(ly, 1, -1) - v(ly, -1, 1)
                    - v(ly, -1, -1)) + f2 * (v(ly, 1, 0) - v(ly, -1, 0))
        if fixed:
            dxx, dxy, dyy = dxx >> 16, dxy >> 16, dyy >> 16
        det = dxx * dyy - dxy * dxy

        outs = (L, det, lx, ly)
        for ref, val in zip((L_ref, det_ref, lx_ref, ly_ref), outs):
            blkv = val[halo:halo + bh, :]
            ref[...] = blkv if batch == 1 else blkv[None]

    return kernel


def _choose_block_height(h: int, halo: int):
    """Largest 8-multiple block height <= 64 whose block-rounding tail
    keeps the bottom reflect halo a single continued mirror
    (h > hp - h + halo + 1).  Returns None when no block height works
    (the plane is too small for the halo)."""
    if h <= halo + 1:
        return None
    top = min(64, -(-h // 8) * 8)
    for bh in range(top, 0, -8):
        hp = -(-h // bh) * bh
        if h > hp - h + halo + 1:
            return bh
    return None


def fused_supported(h: int, w: int, taus, step: int,
                    smooth_radius: int = 2) -> bool:
    """Whether ``fused_sublevel`` can handle this plane: both reflect
    halos must be single continued mirrors (ADVICE r2: heights just above
    a block boundary used to trip the bottom-halo assert)."""
    halo = _halo_for(step, len(taus), smooth_radius)
    if w <= halo + 1:
        return False
    return _choose_block_height(h, halo) is not None


def _pad_reflect(x, halo: int, bot_halo: int, wp: int):
    """[H, W] -> [halo + H + bot_halo, wp] with reflect-101 halos (one
    continued mirror — never a reflect-of-reflect — and zero fill past the
    reflected columns)."""
    h, w = x.shape
    assert h > bot_halo + 1 and h > halo + 1, "plane too small for halo"
    top = x[1:halo + 1][::-1]
    bot = x[h - bot_halo - 1:h - 1][::-1]
    xv = jnp.concatenate([top, x, bot], axis=0)
    left = xv[:, 1:halo + 1][:, ::-1]
    right = xv[:, w - halo - 1:w - 1][:, ::-1]
    xh = jnp.concatenate([left, xv, right], axis=1)
    return jnp.pad(xh, ((0, 0), (0, wp - xh.shape[1])))


@partial(jax.jit, static_argnames=("taus", "step", "interpret",
                                   "smooth_var", "smooth_radius",
                                   "first_sublevel", "diffusivity",
                                   "fixed"))
def fused_sublevel(src, ikc, taus, step: int, smooth=None,
                   interpret: bool = False, smooth_var: float = 1.0,
                   smooth_radius: int = 2, first_sublevel: bool = False,
                   diffusivity: Diffusivity = Diffusivity.PM_G2,
                   fixed: bool = False):
    """One scale-space sublevel, fused.

    Args:
      src: [H, W] f32 — the previous sublevel's L (or the decimated image
        for an octave-start sublevel).
      ikc: scalar f32, 1 / kcontrast^2.
      taus: static tuple of FED step sizes.
      step: static sigma_size for the derivative stencils.
      smooth: optional [H, W] f32 precomputed sigma-1 smooth (octave-start
        sublevels get it from down_with_smooth); computed in-kernel
        otherwise with a Gaussian of (smooth_var, smooth_radius).
      first_sublevel: L output = the in-kernel smooth (the base lowpass of
        akaze.cpp:325-332) instead of the diffused source.

    Returns (L, det, lx, ly), each [H, W] f32.
    """
    h, w = src.shape
    halo = _halo_for(step, len(taus), smooth_radius)
    bh = _choose_block_height(h, halo)
    if bh is None or w <= halo + 1:
        raise ValueError(
            f"plane {h}x{w} too small for halo {halo}; guard calls with "
            f"fused_supported()")
    n_blocks = -(-h // bh)
    hp = n_blocks * bh
    wp = -(-(w + 2 * halo) // 128) * 128

    # the bottom halo also covers the block-rounding tail (hp - h) with
    # one continued mirror so bottom-border outputs stay exact
    bot = hp - h + halo
    srcp = _pad_reflect(src, halo, bot, wp)
    smooth_outside = smooth is not None
    smp = _pad_reflect(smooth, halo, bot, wp) if smooth_outside else srcp

    kernel = _make_kernel(taus, step, bh, halo, wp, n_blocks,
                          smooth_outside, smooth_var, smooth_radius,
                          first_sublevel, diffusivity, fixed)
    rows = bh + 2 * halo
    dtype = jnp.int32 if fixed else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((bh, wp), lambda i, *_: (i, 0))
                   for _ in range(4)],
        scratch_shapes=[
            pltpu.VMEM((2, rows, wp), dtype),
            pltpu.VMEM((2, rows, wp), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), dtype)
                   for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(ikc, jnp.float32).reshape(1), srcp, smp)
    L, det, lx, ly = outs
    sl = (slice(0, h), slice(halo, halo + w))
    return L[sl], det[sl], lx[sl], ly[sl]


@partial(jax.jit, static_argnames=("taus", "step", "interpret",
                                   "smooth_var", "smooth_radius",
                                   "first_sublevel", "diffusivity",
                                   "fixed"))
def fused_sublevel_batch(src, ikc, taus, step: int, smooth=None,
                         interpret: bool = False, smooth_var: float = 1.0,
                         smooth_radius: int = 2,
                         first_sublevel: bool = False,
                         diffusivity: Diffusivity = Diffusivity.PM_G2,
                         fixed: bool = False):
    """``fused_sublevel`` over a leading image axis in ONE kernel launch:
    the grid walks every image's row blocks back to back (pair batching —
    the manual-DMA kernel cannot be vmapped, so the batch axis is folded
    into the grid instead).

    Args: src [B, H, W], ikc [B], smooth optional [B, H, W]; otherwise as
    ``fused_sublevel``.  Returns (L, det, lx, ly), each [B, H, W].
    """
    nb, h, w = src.shape
    halo = _halo_for(step, len(taus), smooth_radius)
    bh = _choose_block_height(h, halo)
    if bh is None or w <= halo + 1:
        raise ValueError(
            f"plane {h}x{w} too small for halo {halo}; guard calls with "
            f"fused_supported()")
    n_blocks = -(-h // bh)
    hp = n_blocks * bh
    wp = -(-(w + 2 * halo) // 128) * 128
    bot = hp - h + halo

    srcp = jax.vmap(lambda x: _pad_reflect(x, halo, bot, wp))(src)
    smooth_outside = smooth is not None
    smp = (jax.vmap(lambda x: _pad_reflect(x, halo, bot, wp))(smooth)
           if smooth_outside else srcp)

    kernel = _make_kernel(taus, step, bh, halo, wp, n_blocks,
                          smooth_outside, smooth_var, smooth_radius,
                          first_sublevel, diffusivity, fixed, batch=nb)
    rows = bh + 2 * halo
    dtype = jnp.int32 if fixed else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb * n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((1, bh, wp),
                                lambda i, *_: (i // n_blocks,
                                               i % n_blocks, 0))
                   for _ in range(4)],
        scratch_shapes=[
            pltpu.VMEM((2, rows, wp), dtype),
            pltpu.VMEM((2, rows, wp), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb, hp, wp), dtype)
                   for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(ikc, jnp.float32).reshape(nb), srcp, smp)
    L, det, lx, ly = outs
    sl = (slice(None), slice(0, h), slice(halo, halo + w))
    return L[sl], det[sl], lx[sl], ly[sl]
