"""Data-parallel frame processing over a device mesh.

The reference processes frames sequentially on one GPU (main.cpp:201-205).
Here a batch of frames is sharded over the ``data`` mesh axis; the whole
detect+describe program runs per shard with zero communication, and the
pairwise matching step all-gathers train descriptors over ICI
(see sharded_match.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import Features, detect_and_compute
from ..plan import PipelinePlan
from ..match import match


def _xla_only_plan(plan: PipelinePlan) -> PipelinePlan:
    """Plan with the Pallas kernels disabled: vmapping the descriptor
    kernel multiplies its VMEM scratch past the 16 MB scoped limit, so the
    batched path uses the (bit-identical) XLA formulation."""
    if plan.config.pallas_descriptor == "off":
        return plan
    return dataclasses.replace(
        plan, config=dataclasses.replace(plan.config,
                                         pallas_descriptor="off"))


def batched_detect_and_compute(images, plan: PipelinePlan,
                               fixed: bool = False) -> Features:
    """vmap of the single-frame pipeline over a leading batch axis."""
    plan = _xla_only_plan(plan)
    return jax.vmap(lambda im: detect_and_compute(im, plan, fixed))(images)


def dp_pipeline_step(images_a, images_b, plan: PipelinePlan, mesh: Mesh,
                     fixed: bool = False):
    """One data-parallel step: detect+describe+match B frame pairs sharded
    over the mesh's ``data`` axis.  Returns (features_a, features_b, matches)
    with batch-sharded layouts."""
    sharding = NamedSharding(mesh, P("data"))

    @partial(jax.jit,
             in_shardings=(sharding, sharding),
             out_shardings=(sharding, sharding, sharding))
    def step(a, b):
        fa = batched_detect_and_compute(a, plan, fixed)
        fb = batched_detect_and_compute(b, plan, fixed)
        m = jax.vmap(lambda f1, f2: match(
            f1.words, f1.valid, f2.words, f2.valid, f2.x, f2.y,
            plan.config.max_dist, use_pallas="off"))(fa, fb)
        return fa, fb, m

    a = jax.device_put(images_a, sharding)
    b = jax.device_put(images_b, sharding)
    return step(a, b)
