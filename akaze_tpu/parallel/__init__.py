from .mesh import make_mesh
from .data_parallel import batched_detect_and_compute, dp_pipeline_step
from .sharded_match import sharded_match

__all__ = ["make_mesh", "batched_detect_and_compute", "dp_pipeline_step",
           "sharded_match"]
