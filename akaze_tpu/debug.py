"""Debug visualization hooks: inspect every intermediate plane.

The reference's compile-time ``DEBUG_SHOW`` path copies each intermediate
(nld image, Hessian determinant, derivatives, response/size/layer maps)
into cv::Mats after every kernel for manual inspection (akaze.cpp:7-11,
293-298, 334-351, 378-390, 441-445).  Here the pipeline is pure, so the
equivalent is a function that returns all intermediates as arrays — plus a
dump helper that renders them to PNGs.
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .detect import build_extrema_maps, nms
from .plan import PipelinePlan
from .scale_space import build_scale_space


def debug_planes(image, plan: PipelinePlan, fixed: bool = False
                 ) -> Dict[str, np.ndarray]:
    """Run the scale-space + detection front half and return every
    intermediate plane, keyed like the reference's debug mats:

      L{o}_{s}, det{o}_{s}, lx{o}_{s}, ly{o}_{s}   per sublevel
      response_map, size_map, layer_map             full resolution
      nms_mask                                      full resolution
    """
    image = jnp.asarray(image)
    octaves, kcontrast = build_scale_space(image, plan, fixed)
    out: Dict[str, np.ndarray] = {"kcontrast": np.asarray(kcontrast)}
    for oi, o in enumerate(octaves):
        for si in range(o.L.shape[0]):
            out[f"L{oi}_{si}"] = np.asarray(o.L[si])
            out[f"det{oi}_{si}"] = np.asarray(o.det[si])
            out[f"lx{oi}_{si}"] = np.asarray(o.lx[si])
            out[f"ly{oi}_{si}"] = np.asarray(o.ly[si])
    resp, size, layer = build_extrema_maps(octaves, plan, fixed)
    mask = nms(resp, size, layer, plan, fixed)
    out["response_map"] = np.asarray(resp)
    out["size_map"] = np.asarray(size)
    out["layer_map"] = np.asarray(layer)
    out["nms_mask"] = np.asarray(mask)
    return out


def dump_planes(planes: Dict[str, np.ndarray], out_dir: str) -> None:
    """Render each plane to a normalized grayscale PNG in ``out_dir``."""
    from .viz import write_png

    os.makedirs(out_dir, exist_ok=True)
    for name, arr in planes.items():
        a = np.asarray(arr, np.float64)
        if a.ndim != 2:
            continue
        lo, hi = np.nanmin(a), np.nanmax(a)
        norm = (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)
        write_png(os.path.join(out_dir, f"{name}.png"),
                  (norm * 255).astype(np.uint8))
