"""Scharr derivatives, gradient magnitude and Hessian determinant.

Float path reference kernels: gScharrContrastNaive (akazed.cu:644-667),
gDerivate (akazed.cu:1267-1296), gHessianDeterminant (akazed.cu:1299-1331).
Fixed-point variants: akazed.cu:3208-3231, 3339-3403.

The unnormalized Scharr weights are 10 (center) and 3 (diagonals); the scaled
derivative kernels use fac1 = 1/(2*(10/3+2)) and fac2 = (10/3)*fac1
(akazed.cu:2537-2539) with the sampling step dilated by ``sigma_size``.
All borders are reflect-101 via ``abs``/``borderAdd``, i.e. ``mode='reflect'``.
"""

from __future__ import annotations

import jax.numpy as jnp

SCHARR_FAC1 = 1.0 / (2.0 * (10.0 / 3.0 + 2.0))   # 0.09375
SCHARR_FAC2 = (10.0 / 3.0) * SCHARR_FAC1         # 0.3125
SCHARR_IFAC1 = int(SCHARR_FAC1 * 65536 + 0.5)    # akazed.cu:4184
SCHARR_IFAC2 = int(SCHARR_FAC2 * 65536 + 0.5)    # akazed.cu:4185


def _shift9(x, step: int):
    """The 9 reflect-101 shifted views of x at offsets in {-step, 0, +step}.

    Returns dict keyed by (dy, dx) in {-1, 0, 1} (units of ``step``).
    """
    h, w = x.shape
    xp = jnp.pad(x, step, mode="reflect")
    out = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out[(dy, dx)] = xp[step + dy * step: step + dy * step + h,
                               step + dx * step: step + dx * step + w]
    return out


def scharr_gradient_xy(x, step: int = 1):
    """Unnormalized Scharr gradients (weights 10/3), reflect-101 borders."""
    v = _shift9(x, step)
    dx = 10 * (v[(0, 1)] - v[(0, -1)]) + 3 * (v[(-1, 1)] + v[(1, 1)]
                                              - v[(-1, -1)] - v[(1, -1)])
    dy = 10 * (v[(1, 0)] - v[(-1, 0)]) + 3 * (v[(1, -1)] + v[(1, 1)]
                                              - v[(-1, -1)] - v[(-1, 1)])
    return dx, dy


def scharr_magnitude(x):
    """|grad| with unnormalized Scharr weights (gScharrContrastNaive)."""
    dx, dy = scharr_gradient_xy(x, 1)
    return jnp.sqrt(dx * dx + dy * dy)


def scharr_magnitude_fixed(x):
    """Fixed-point |grad| with round-to-nearest sqrt (akazed.cu:3230)."""
    dx, dy = scharr_gradient_xy(x, 1)
    m = jnp.sqrt((dx * dx + dy * dy).astype(jnp.float32))
    return (m + 0.5).astype(jnp.int32)


def scaled_derivatives(x, step: int):
    """gDerivate (akazed.cu:1267-1296): normalized Scharr first derivatives
    with sampling step ``step``.  Returns (Lx, Ly)."""
    v = _shift9(x, step)
    fac1 = jnp.float32(SCHARR_FAC1)
    fac2 = jnp.float32(SCHARR_FAC2)
    lx = fac1 * (v[(-1, 1)] + v[(1, 1)] - v[(-1, -1)] - v[(1, -1)]) \
        + fac2 * (v[(0, 1)] - v[(0, -1)])
    ly = fac1 * (v[(1, 1)] + v[(1, -1)] - v[(-1, 1)] - v[(-1, -1)]) \
        + fac2 * (v[(1, 0)] - v[(-1, 0)])
    return lx, ly


def scaled_derivatives_fixed(x, step: int):
    """Fixed-point gDerivate (akazed.cu:3339-3368): 16.16 factors, ``>> 16``."""
    v = _shift9(x, step)
    f1 = jnp.int32(SCHARR_IFAC1)
    f2 = jnp.int32(SCHARR_IFAC2)
    lx = (f1 * (v[(-1, 1)] + v[(1, 1)] - v[(-1, -1)] - v[(1, -1)])
          + f2 * (v[(0, 1)] - v[(0, -1)])) >> 16
    ly = (f1 * (v[(1, 1)] + v[(1, -1)] - v[(-1, 1)] - v[(-1, -1)])
          + f2 * (v[(1, 0)] - v[(-1, 0)])) >> 16
    return lx, ly


def hessian_determinant(lx, ly, step: int):
    """gHessianDeterminant (akazed.cu:1299-1331): second derivatives from
    (Lx, Ly) with the same dilated stencil; det = Lxx*Lyy - Lxy^2."""
    vx = _shift9(lx, step)
    vy = _shift9(ly, step)
    fac1 = jnp.float32(SCHARR_FAC1)
    fac2 = jnp.float32(SCHARR_FAC2)
    dxx = fac1 * (vx[(-1, 1)] + vx[(1, 1)] - vx[(-1, -1)] - vx[(1, -1)]) \
        + fac2 * (vx[(0, 1)] - vx[(0, -1)])
    dxy = fac1 * (vx[(1, 1)] + vx[(1, -1)] - vx[(-1, 1)] - vx[(-1, -1)]) \
        + fac2 * (vx[(1, 0)] - vx[(-1, 0)])
    dyy = fac1 * (vy[(1, 1)] + vy[(1, -1)] - vy[(-1, 1)] - vy[(-1, -1)]) \
        + fac2 * (vy[(1, 0)] - vy[(-1, 0)])
    return dxx * dyy - dxy * dxy


def hessian_determinant_fixed(lx, ly, step: int):
    """Fixed-point gHessianDeterminant (akazed.cu:3371-3403)."""
    vx = _shift9(lx, step)
    vy = _shift9(ly, step)
    f1 = jnp.int32(SCHARR_IFAC1)
    f2 = jnp.int32(SCHARR_IFAC2)
    dxx = (f1 * (vx[(-1, 1)] + vx[(1, 1)] - vx[(-1, -1)] - vx[(1, -1)])
           + f2 * (vx[(0, 1)] - vx[(0, -1)])) >> 16
    dxy = (f1 * (vx[(1, 1)] + vx[(1, -1)] - vx[(-1, 1)] - vx[(-1, -1)])
           + f2 * (vx[(1, 0)] - vx[(-1, 0)])) >> 16
    dyy = (f1 * (vy[(1, 1)] + vy[(1, -1)] - vy[(-1, 1)] - vy[(-1, -1)])
           + f2 * (vy[(1, 0)] - vy[(-1, 0)])) >> 16
    return dxx * dyy - dxy * dxy
