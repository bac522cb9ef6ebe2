"""Perona-Malik conductivity and the FED diffusion step.

Reference kernels: gFlowNaive (akazed.cu:1068-1107; fixed point
akazed.cu:3406-3446) and gNldStepNaive (akazed.cu:1241-1264; fixed point
akazed.cu:3449-3473).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Diffusivity
from .scharr import scharr_gradient_xy


def _conductivity_from_dif2(dif2, diffusivity: Diffusivity):
    if diffusivity == Diffusivity.PM_G1:
        return jnp.exp(-dif2)
    if diffusivity == Diffusivity.PM_G2:
        return 1.0 / (1.0 + dif2)
    if diffusivity == Diffusivity.WEICKERT:
        return 1.0 - jnp.exp(-3.315 / (dif2 ** 4))
    # CHARBONNIER
    return 1.0 / jnp.sqrt(1.0 + dif2)


def conductivity(smooth, diffusivity: Diffusivity, kcontrast):
    """g(|grad L_smooth|) with unnormalized Scharr gradients.

    ``kcontrast`` may be a traced scalar (it is computed from the image).
    ikc = 1/kcontrast^2 as in hFlow (akazed.cu:2493).
    """
    dx, dy = scharr_gradient_xy(smooth, 1)
    ikc = 1.0 / (kcontrast * kcontrast)
    dif2 = ikc * (dx * dx + dy * dy)
    return _conductivity_from_dif2(dif2, diffusivity)


def conductivity_fixed(smooth, diffusivity: Diffusivity, kcontrast):
    """Fixed-point flow: int Scharr, float conductivity, stored x65536
    rounded (akazed.cu:3406-3446).  ``kcontrast``: int32 scalar."""
    dx, dy = scharr_gradient_xy(smooth, 1)
    ikc = 1.0 / (kcontrast * kcontrast).astype(jnp.float32)
    dif2 = (dx * dx + dy * dy).astype(jnp.float32) * ikc
    g = _conductivity_from_dif2(dif2, diffusivity)
    return (g * 65536 + 0.5).astype(jnp.int32)


def _neighbors4(x):
    """Reflect-101 N/S/E/W views."""
    h, w = x.shape
    xp = jnp.pad(x, 1, mode="reflect")
    c = xp[1:1 + h, 1:1 + w]
    n = xp[0:h, 1:1 + w]
    s = xp[2:2 + h, 1:1 + w]
    wv = xp[1:1 + h, 0:w]
    e = xp[1:1 + h, 2:2 + w]
    return c, n, s, wv, e


def nld_step(img, flow, tau: float):
    """One explicit diffusion step (gNldStepNaive, akazed.cu:1241-1264):

    dst = img + 0.5*tau * sum_4nb (g_c + g_n) * (I_n - I_c)
    """
    ic, inn, iss, iww, iee = _neighbors4(img)
    fc, fnn, fss, fww, fee = _neighbors4(flow)
    step = ((fc + fee) * (iee - ic) + (fc + fww) * (iww - ic)
            + (fc + fss) * (iss - ic) + (fc + fnn) * (inn - ic))
    return img + jnp.float32(0.5) * tau * step


def nld_step_fixed(img, flow, tau: float):
    """Fixed-point FED step (akazed.cu:3449-3473):

    stepfac = int(0.5*tau*65536 + 0.5); step = (sum ...) >> 16;
    dst = ((stepfac * step) >> 16) + img.
    """
    stepfac = (0.5 * jnp.float32(tau) * 65536 + 0.5).astype(jnp.int32)
    ic, inn, iss, iww, iee = _neighbors4(img)
    fc, fnn, fss, fww, fee = _neighbors4(flow)
    step = ((fc + fee) * (iee - ic) + (fc + fww) * (iww - ic)
            + (fc + fss) * (iss - ic) + (fc + fnn) * (inn - ic)) >> 16
    return ((stepfac * step) >> 16) + img
