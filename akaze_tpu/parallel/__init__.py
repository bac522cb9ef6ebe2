from .mesh import make_mesh, normalize_axes, axis_size
from .data_parallel import (batched_detect_and_compute,
                            dp_pipeline_step,
                            dp_pipeline_step_multihost, make_dp_step)
from .sharded_match import sharded_match
from .sharded_ba import (sharded_bundle_adjust, pad_observations,
                         partition_landmarks, gather_points, scatter_points,
                         landmark_sharded_bundle_adjust, LandmarkPartition)
from .sharded_pgo import sharded_optimize_pose_graph, pad_edges
from .distributed import (initialize_distributed, make_host_chip_mesh,
                          hier_psum, process_local_batch,
                          HOST_AXIS, CHIP_AXIS, HIER_AXES)
from .spatial import (spatial_scale_space, spatial_supported,
                      spatial_detect_and_compute)

__all__ = ["make_mesh", "normalize_axes", "axis_size",
           "batched_detect_and_compute", "dp_pipeline_step",
           "make_dp_step", "dp_pipeline_step_multihost",
           "sharded_match", "sharded_bundle_adjust", "pad_observations",
           "partition_landmarks", "gather_points", "scatter_points",
           "landmark_sharded_bundle_adjust", "LandmarkPartition",
           "sharded_optimize_pose_graph", "pad_edges",
           "initialize_distributed", "make_host_chip_mesh", "hier_psum", "process_local_batch",
           "HOST_AXIS", "CHIP_AXIS", "HIER_AXES",
           "spatial_scale_space", "spatial_supported",
           "spatial_detect_and_compute"]
