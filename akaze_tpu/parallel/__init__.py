from .mesh import make_mesh
from .data_parallel import batched_detect_and_compute, dp_pipeline_step
from .sharded_match import sharded_match
from .sharded_ba import sharded_bundle_adjust, pad_observations
from .sharded_pgo import sharded_optimize_pose_graph, pad_edges

__all__ = ["make_mesh", "batched_detect_and_compute", "dp_pipeline_step",
           "sharded_match", "sharded_bundle_adjust", "pad_observations",
           "sharded_optimize_pose_graph", "pad_edges"]
