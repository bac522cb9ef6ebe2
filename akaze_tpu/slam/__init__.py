"""SLAM/SfM back-end: pose-graph optimization and sparse bundle adjustment.

New design work beyond the reference (SURVEY.md §5 "checkpoint/resume" note,
§7 step 7): the reference stops at descriptor matching; the north star
extends it into a distributed back-end.  Both solvers are pure jitted
functions over statically shaped SoA state, and the BA solver's
Schur-complement reduction is expressed with segment-sums + ``psum`` so the
same code runs single-chip or sharded over a device mesh (see
parallel/sharded_ba.py).
"""

from .posegraph import PoseGraph, optimize_pose_graph
from .system import SlamSystem, SlamConfig
from .odometry import VisualOdometry, Intrinsics
from .ba import BAProblem, bundle_adjust, ba_residuals

__all__ = ["PoseGraph", "optimize_pose_graph", "BAProblem", "bundle_adjust",
           "ba_residuals", "SlamSystem", "SlamConfig", "VisualOdometry",
           "Intrinsics"]
