"""Nonlinear (FED) scale-space construction.

Replicates the state machine of ``Akazer::detect`` (akaze.cpp:300-439) and
``Akazer::fastDetect`` (akaze.cpp:506-743) as a single pure function.  The
reference serialises ~100 kernel launches with a device sync after each
(akazed.cu:2520 etc.); here the whole pyramid builds inside one jitted XLA
program — octave shapes and FED trip counts are static (see plan.py), the
diffusion inner loop is a ``lax.scan`` over a constant tau table, and the
contrast percentile never leaves the device.

Per sublevel we keep four planes, mirroring the reference's octave scratch
layout (akaze.cpp:315-320 — nldimg / smooth->det / flow->Lx / temp->Ly):

  L    diffused image (descriptor intensity samples)
  det  Hessian determinant response (detection)
  lx   first derivative Lx at the sublevel's sigma step (orientation/descr.)
  ly   first derivative Ly

Derivatives are computed on the sigma=1-smoothed predecessor image exactly
as the reference does (gDerivate src = the ``smooth`` plane;
akaze.cpp:344,423).
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import AkazeConfig
from .ops import (conductivity, conductivity_fixed, down_with_smooth,
                  down_with_smooth_fixed, hessian_determinant,
                  hessian_determinant_fixed, lowpass, lowpass_fixed,
                  nld_step, nld_step_fixed, percentile_contrast,
                  percentile_contrast_fixed, scaled_derivatives,
                  scaled_derivatives_fixed, scharr_magnitude,
                  scharr_magnitude_fixed)
from .plan import PipelinePlan


class OctaveData(NamedTuple):
    """Stacked per-sublevel planes for one octave: each [max_scale, H, W]."""
    L: jax.Array
    det: jax.Array
    lx: jax.Array
    ly: jax.Array


def _diffuse(img, flow, taus: Tuple[float, ...], fixed: bool):
    """Run the FED inner loop (akaze.cpp:383-391) as a scan over a static
    tau table."""
    if not taus:
        return img
    step_fn = nld_step_fixed if fixed else nld_step
    if len(taus) == 1:
        return step_fn(img, flow, taus[0])
    tau_arr = jnp.asarray(taus, jnp.float32)

    def body(carry, tau):
        return step_fn(carry, flow, tau), None

    out, _ = jax.lax.scan(body, img, tau_arr)
    return out


def build_scale_space(image, plan: PipelinePlan, fixed: bool = False
                      ) -> Tuple[List[OctaveData], jax.Array]:
    """Build the nonlinear scale space.

    Args:
      image: [H, W]; float32 in [0, 1] for the float path, int32 in [0, 255]
        for the fixed-point path (the demo never normalises the fast input,
        main.cpp:257-258).  A leading batch axis ([B, H, W]) builds B
        images' pyramids in one program: the XLA ops vmap and each fused
        Pallas sublevel walks all B images' row blocks in ONE launch
        (pair batching; the manual-DMA kernel cannot be vmapped).
      plan: static plan from ``build_plan``.
      fixed: choose the 16.16 fixed-point flavour.

    Returns:
      (octaves, kcontrast): per-octave stacked planes and the (traced)
      contrast factor after all octave decays ([B] when batched).
    """
    cfg = plan.config
    soffset = cfg.soffset
    batched = image.ndim == 3

    def V(f):
        """Map a per-image function over the batch axis (identity when
        unbatched), capturing static args via the closure."""
        return jax.vmap(f) if batched else f

    lowpass_fn = lowpass_fixed if fixed else lowpass
    conduct_fn = conductivity_fixed if fixed else conductivity
    deriv_fn = scaled_derivatives_fixed if fixed else scaled_derivatives
    hess_fn = hessian_determinant_fixed if fixed else hessian_determinant

    # fused Pallas sublevel kernel (float AND 16.16 fixed flavours, all
    # four diffusivities): one VMEM pass per sublevel instead of ~8
    # HBM-bound XLA stencils.  Planes too small for the stencil halo fall
    # back to the XLA ops per sublevel (fused_supported).
    mode = cfg.pallas_scale_space
    use_fused = (mode in ("on", "interpret")
                 or (mode == "auto" and jax.default_backend() == "tpu"))
    fused_interp = mode == "interpret"
    if use_fused:
        from .ops.pallas_sublevel import (fused_supported, fused_sublevel,
                                          fused_sublevel_batch)
        fused_fn = fused_sublevel_batch if batched else fused_sublevel
    diffusivity = cfg.diffusivity

    def _ikc(kc):
        if fixed:  # conductivity_fixed's expression order
            return 1.0 / (kc * kc).astype(jnp.float32)
        return 1.0 / (kc * kc)

    octaves: List[OctaveData] = []
    kcontrast = None
    prev_L_last = None

    for oi, oct_plan in enumerate(plan.octaves):
        Ls, dets, lxs, lys = [], [], [], []
        L_prev = None
        for sp in oct_plan.scales:
            if oi == 0 and sp.scale == 0:
                # First sublevel (akaze.cpp:325-353): estimate the contrast
                # percentile on a sigma=1 smooth, then base-smooth the input
                # with sigma = soffset.
                pre = V(lambda x: lowpass_fn(x, 1.0, 5))(image)
                mag = V(scharr_magnitude_fixed if fixed
                        else scharr_magnitude)(pre)
                pct_fn = (percentile_contrast_fixed if fixed
                          else percentile_contrast)
                kcontrast = V(lambda m: pct_fn(m, cfg.per))(mag)
                var = soffset * soffset
                ksz = 2 * math.ceil((soffset - 0.8) / 0.3) + 3
                from .ops.conv import radius_for_ksize
                if use_fused and fused_supported(
                        *image.shape[-2:], (), sp.sigma_size,
                        radius_for_ksize(ksz)):
                    L, det, lx, ly = fused_fn(
                        image, _ikc(kcontrast), (), sp.sigma_size,
                        smooth_var=var,
                        smooth_radius=radius_for_ksize(ksz),
                        first_sublevel=True, interpret=fused_interp,
                        fixed=fixed)
                    Ls.append(L)
                    dets.append(det)
                    lxs.append(lx)
                    lys.append(ly)
                    L_prev = L
                    continue
                L = V(lambda x: lowpass_fn(x, var, ksz))(image)
                smooth = L  # smooth = copy of nldimg (akaze.cpp:332)
            elif sp.scale == 0:
                # New octave (akaze.cpp:371-391): decay kcontrast, decimate
                # with fused smooth, diffuse the full tau cycle.
                if fixed:
                    kcontrast = (kcontrast.astype(jnp.float32) * 0.75
                                 + 0.5).astype(jnp.int32)
                    dst, smooth = V(down_with_smooth_fixed)(prev_L_last)
                else:
                    kcontrast = kcontrast * jnp.float32(0.75)
                    dst, smooth = V(down_with_smooth)(prev_L_last)
                if use_fused and fused_supported(*dst.shape[-2:], sp.taus,
                                                 sp.sigma_size):
                    L, det, lx, ly = fused_fn(
                        dst, _ikc(kcontrast), sp.taus, sp.sigma_size,
                        smooth=smooth, interpret=fused_interp,
                        diffusivity=diffusivity, fixed=fixed)
                    Ls.append(L)
                    dets.append(det)
                    lxs.append(lx)
                    lys.append(ly)
                    L_prev = L
                    continue
                flow = V(lambda s, kc: conduct_fn(s, cfg.diffusivity, kc))(
                    smooth, kcontrast) if batched else conduct_fn(
                    smooth, cfg.diffusivity, kcontrast)
                L = V(lambda d, f: _diffuse(d, f, sp.taus, fixed))(dst, flow)
            else:
                # Next sublevel (akaze.cpp:393-420): sigma=1 smooth of the
                # previous L, conductivity, diffuse.
                if use_fused and fused_supported(*L_prev.shape[-2:],
                                                 sp.taus, sp.sigma_size):
                    L, det, lx, ly = fused_fn(
                        L_prev, _ikc(kcontrast), sp.taus, sp.sigma_size,
                        interpret=fused_interp, diffusivity=diffusivity,
                        fixed=fixed)
                    Ls.append(L)
                    dets.append(det)
                    lxs.append(lx)
                    lys.append(ly)
                    L_prev = L
                    continue
                smooth = V(lambda x: lowpass_fn(x, 1.0, 5))(L_prev)
                flow = V(lambda s, kc: conduct_fn(s, cfg.diffusivity, kc))(
                    smooth, kcontrast) if batched else conduct_fn(
                    smooth, cfg.diffusivity, kcontrast)
                L = V(lambda i, f: _diffuse(i, f, sp.taus, fixed))(
                    L_prev, flow)

            lx, ly = V(lambda s: deriv_fn(s, sp.sigma_size))(smooth)
            det = V(lambda a, b: hess_fn(a, b, sp.sigma_size))(lx, ly)
            Ls.append(L)
            dets.append(det)
            lxs.append(lx)
            lys.append(ly)
            L_prev = L

        prev_L_last = L_prev
        # sublevel stack axis: [S, H, W] per octave; batched pyramids put
        # the image axis first ([B, S, H, W]) so detect vmaps per image
        ax = 1 if batched else 0
        octaves.append(OctaveData(L=jnp.stack(Ls, axis=ax),
                                  det=jnp.stack(dets, axis=ax),
                                  lx=jnp.stack(lxs, axis=ax),
                                  ly=jnp.stack(lys, axis=ax)))

    return octaves, kcontrast
