"""Configuration for the TPU-native AKAZE pipeline.

The reference exposes these parameters through ``Akazer::init``
(reference: akaze.cpp:80-98) with demo defaults at main.cpp:156-166.  Here they
form a hashable, frozen dataclass so that a configuration can be used as a
static argument to ``jax.jit`` — everything derived from it (octave shapes,
FED step tables, border tables) is baked into the compiled program instead of
living in CUDA ``__constant__`` memory (reference: akazed.cu:18-25).
"""

from __future__ import annotations

import dataclasses
import enum


class Diffusivity(enum.IntEnum):
    """Conductivity function g(|grad L|) selecting the diffusion flavour.

    Reference: akaze_structures.h:53-59 and the kernels at akazed.cu:1091-1106.
    """

    PM_G1 = 0
    PM_G2 = 1
    WEICKERT = 2
    CHARBONNIER = 3


@dataclasses.dataclass(frozen=True)
class AkazeConfig:
    """Tuning parameters of the AKAZE detector/descriptor.

    Defaults mirror the reference demo configuration (main.cpp:156-166).
    """

    max_pts: int = 10000            # capacity of the keypoint tensors
    noctaves: int = 4               # pyramid octaves (may shrink for small images)
    max_scale: int = 4              # sublevels per octave
    per: float = 0.7                # percentile for the contrast factor
    kcontrast: float = 0.03         # initial contrast factor
    soffset: float = 1.6            # base scale offset (sigma units)
    reordering: bool = True         # FED step reordering
    derivative_factor: float = 1.5  # multiscale derivative factor
    dthreshold: float = 0.001       # detector response threshold (float path)
    idthreshold: int = 65           # detector response threshold (int path,
                                    # reference: akaze.cpp:560)
    diffusivity: Diffusivity = Diffusivity.PM_G2
    descriptor_pattern_size: int = 10
    tau_max: float = 0.25           # max FED step size (reference: akaze.cpp:268)
    max_dist: int = 96              # Hamming acceptance threshold
                                    # (MAX_DIST, akazed.cu:11)
    # NOTE: there is deliberately no "match rule" knob.  The reference's two
    # matchers — gHammingMatch's strictly-unique minimum (akazed.cu:2207-2231)
    # and gMatch's 1st < 2nd (akazed.cu:2106) — both collapse to
    # "best < second_best and best < max_dist" once lane-aliasing artifacts
    # are removed (see match.py's module docstring), so one matcher serves
    # both.
    # sample per-keypoint windows in bfloat16 on the float path (the one-hot
    # gathers stay exact; only the sampled intensities round — match quality
    # is unchanged at the acceptance bar of SURVEY.md §7(d) while HBM
    # traffic halves)
    bf16_sampling: bool = True
    # fused Pallas orientation+descriptor kernel (float path):
    #   'auto'      use it on the TPU backend, XLA path elsewhere
    #   'on'        always (compiled)
    #   'interpret' always, in the Pallas interpreter (for CPU tests)
    #   'off'       never
    pallas_descriptor: str = "auto"
    # fused Pallas scale-space sublevel kernel (float and 16.16 fixed
    # flavours, all four diffusivities; planes too small for the stencil
    # halo fall back to the XLA ops per sublevel).  Same mode values as
    # pallas_descriptor.
    pallas_scale_space: str = "auto"
    # fixed (fastakaze) path + Pallas descriptor: sample bit-faithfully
    # (f32 windows, per-tap rotation + int truncation, the reference's
    # fast polynomial atan2 — akazed.cu:3685,3779-3780) instead of the
    # default approximate bf16 float sampling (measured bound:
    # benchmarks/fixed_descriptor_bound.py).  Exactness costs sampling
    # matmul throughput (f32 vs bf16 on the MXU).
    fixed_exact_sampling: bool = False
    # Pallas descriptor window delivery:
    #   True   shared row-band windows — keypoints are band-sorted in-graph
    #          and whole [384, W] plane bands stream through VMEM once,
    #          each keypoint's [128, 256] window sliced out locally with
    #          dynamically-offset MXU reads (~8x less HBM window traffic
    #          at stock density; bit-identical outputs)
    #   False  one private window DMA per keypoint (the r1-r4 kernel)
    banded_windows: bool = True

    # smax scale multiplier for the extrema border; 10*sqrt(2) for the MLDB
    # descriptor family (FEATURE_TYPE 5; reference: akaze.cpp:277-285).
    @property
    def smax(self) -> float:
        return 10.0 * (2.0 ** 0.5)

    def __post_init__(self):
        if self.max_scale < 1 or self.max_scale > 5:
            raise ValueError("max_scale must be in [1, 5]")
        if self.noctaves < 1:
            raise ValueError("noctaves must be >= 1")
        for field in ("pallas_descriptor", "pallas_scale_space"):
            if getattr(self, field) not in ("auto", "on", "interpret",
                                            "off"):
                raise ValueError(
                    f"{field} must be 'auto', 'on', 'interpret' or 'off'")


DESCRIPTOR_BITS = 486     # 3 channels x (C(4,2) + C(9,2) + C(16,2)) comparisons
DESCRIPTOR_BYTES = 61     # ceil(486 / 8); reference: akaze_structures.h:29
DESCRIPTOR_WORDS = 16     # 486 bits padded into 16 uint32 words (512 lanes)
