"""Contrast factor estimation (percentile of the gradient magnitude).

Replaces the reference's three-kernel + host-scan sequence
(hScharrContrast, akazed.cu:2410-2484: gScharrContrastNaive ->
gFindMaxContrastU4 atomicMax -> gConstrastHistShared atomics -> host
percentile loop) with a deterministic on-device computation.  No atomics and
no scatter: the cumulative histogram c(m) = #(bin <= m) is a fused
comparison-reduction (a [Npix, 300] broadcast compare that XLA streams
without materialising), and the percentile scan is a searchsorted.
"""

from __future__ import annotations

import jax.numpy as jnp

NBINS = 300  # akazed.cu:8


def _percentile_from_cum(cum, npix: int, per: float):
    """Host percentile loop (akazed.cu:2468-2481) on the cumulative
    histogram.

    cum[m] = #(bin <= m).  Returns k in [1, NBINS]: the smallest k with
    sum(hist[1..k-1]) >= trunc((npix - hist[0]) * per).
    """
    hist0 = cum[0]
    thresh = ((npix - hist0).astype(jnp.float32) * per).astype(jnp.int32)
    cprime = cum - hist0  # cprime[m] = sum(hist[1..m]), cprime[0] = 0
    m = jnp.searchsorted(cprime, thresh, side="left")
    return jnp.minimum(m + 1, NBINS).astype(jnp.int32)


def _cumulative_bins(bins):
    """c(m) = #(bins <= m) for m in [0, NBINS) as a fused broadcast-compare
    reduction."""
    m = jnp.arange(NBINS, dtype=jnp.int32)
    return jnp.sum(bins[:, :, None] <= m[None, None, :], axis=(0, 1),
                   dtype=jnp.int32)


def _percentile_bisect(bins, npix: int, per: float):
    """Percentile bin via 9-step bisection: smallest m with
    #(1 <= bin <= m) >= trunc((npix - #(bin == 0)) * per).

    Equivalent to ``_percentile_from_cum(_cumulative_bins(bins), ...)`` but
    evaluates only ~9 masked full-array reductions instead of a
    [Npix, NBINS] broadcast compare (which cost ~1.2 ms at 960x1280).
    Returns k in [1, NBINS].
    """
    import jax

    hist0 = jnp.sum(bins == 0, dtype=jnp.int32)
    thresh = ((npix - hist0).astype(jnp.float32) * per).astype(jnp.int32)

    def cprime(m):
        return jnp.sum(bins <= m, dtype=jnp.int32) - hist0

    # invariant: cprime(hi) >= thresh (or hi == NBINS-1), cprime(lo-1) <
    # thresh; 2^9 = 512 > NBINS covers the range
    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        ge = cprime(mid) >= thresh
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(
        0, 9, body, (jnp.int32(0), jnp.int32(NBINS - 1)))
    return jnp.minimum(lo + 1, NBINS).astype(jnp.int32)


def percentile_contrast(grad, per: float):
    """Float path: kcontrast = k / hfactor with hfactor = NBINS/max_contrast.

    ``grad``: [H, W] float32 gradient magnitudes.  The max is floored at
    0.03 exactly as the host seeds d_max_contrast (akazed.cu:2413-2417).
    Binning uses truncation toward zero (``__fmul_rz`` + int cast,
    akazed.cu:892-896), clamped to NBINS-1.
    """
    h, w = grad.shape
    max_contrast = jnp.maximum(jnp.float32(0.03), jnp.max(grad))
    hfactor = NBINS / max_contrast
    bins = jnp.clip((grad * hfactor).astype(jnp.int32), 0, NBINS - 1)
    k = _percentile_bisect(bins, h * w, per)
    return k.astype(jnp.float32) / hfactor


def percentile_contrast_fixed(grad, per: float):
    """Fixed-point path (akazed.cu:4098-4172).

    ``grad``: [H, W] int32 magnitudes.  The max is floored at 1; the bin
    factor is quantized 16.16 (akazed.cu:4138) and applied with ``>> 16``;
    kcontrast = k * max_contrast / NBINS with integer division
    (akazed.cu:4169).  Returns int32 kcontrast.
    """
    h, w = grad.shape
    max_contrast = jnp.maximum(jnp.int32(1), jnp.max(grad))
    hfactor = (NBINS / max_contrast.astype(jnp.float32) * 65536
               + 0.5).astype(jnp.int32)
    bins = jnp.clip((grad * hfactor) >> 16, 0, NBINS - 1)
    k = _percentile_bisect(bins, h * w, per)
    return k * max_contrast // NBINS
