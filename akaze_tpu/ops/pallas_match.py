"""Pallas TPU kernel: brute-force Hamming 1-NN with running top-2.

The XLA matcher materialises the full [N1, N2] f32 distance matrix in HBM
(~400 MB at the 10k cap) and re-reads it for min / argmin / masked-second
(~1.2 GB of traffic).  This kernel keeps the entire train descriptor set
resident in VMEM (10k x 512 bf16 = 10 MB) and streams query blocks through
the MXU, maintaining per-query running (best, second, argbest) scratch —
the distance matrix never exists.

Distances use the signed-bits identity of match.py:
    hamming(a, b) = (486 - <sa, sb>) / 2
with sa, sb in {-1, 0, +1}; invalid/padded train rows are zeroed, giving a
constant pseudo-distance of 243 >= MAX_DIST that can never produce a false
accept (and interacts with the uniqueness rule exactly like the XLA
matcher's +1e6 masking — see match.py).

Tie semantics match jnp.argmin + masked-second exactly: the first global
minimum wins; equal top-2 values give best == second (rejected upstream).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 128          # queries per grid step
TB = 512          # train block per inner iteration
LANES = 512       # descriptor lanes (486 live bits)
BITS = 486.0
BIG = 1.0e9


def _make_kernel(n2pad: int):
    n_tblocks = n2pad // TB

    def kernel(counts_ref,  # prefetch [2] i32: query/train last-live-row+1
               q_ref,      # [QB, LANES] bf16 query signed-bits block
               t_ref,      # [n2pad, LANES] bf16 train signed bits (VMEM)
               best_ref,   # out [QB, 128] f32 (lane 0)
               second_ref,  # out [QB, 128] f32
               idx_ref):   # out [QB, 128] i32

        # work scales with the LIVE extents, not the slot capacity: query
        # blocks wholly past the last live query skip compute entirely,
        # and the train loop stops after the block holding the last live
        # train row.  Dead rows before that bound are zeroed signed-bits
        # (pseudo-distance 243 >= MAX_DIST, can never win) and dead query
        # slots are rejected by valid1 upstream, so non-prefix validity
        # (e.g. gathered multi-shard train sets) is handled correctly.
        q_live = pl.program_id(0) * QB < counts_ref[0]
        n_live_tblocks = jnp.minimum(
            (counts_ref[1] + (TB - 1)) // TB, n_tblocks)

        @pl.when(jnp.logical_not(q_live))
        def _():
            best_ref[...] = jnp.full((QB, 128), BIG, jnp.float32)
            second_ref[...] = jnp.full((QB, 128), BIG, jnp.float32)
            idx_ref[...] = jnp.full((QB, 128), -1, jnp.int32)

        @pl.when(q_live)
        def _():
            q = q_ref[:]

            def body(b, carry):
                best, second, idx = carry
                t = t_ref[pl.ds(b * TB, TB), :]
                dot = jax.lax.dot_general(
                    q, t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [QB, TB]
                d = 0.5 * (BITS - dot)
                lane = jax.lax.broadcasted_iota(jnp.int32, (QB, TB), 1)
                m1 = jnp.min(d, axis=1, keepdims=True)      # [QB, 1]
                i1 = jnp.min(jnp.where(d == m1, lane, TB), axis=1,
                             keepdims=True)                 # first minimum
                m2 = jnp.min(jnp.where(lane == i1, BIG, d), axis=1,
                             keepdims=True)
                # merge running top-2 (strict < keeps the earlier
                # occurrence, equal minima collapse to best == second, as
                # in the XLA path)
                new_best = jnp.minimum(best, m1)
                new_second = jnp.minimum(jnp.maximum(best, m1),
                                         jnp.minimum(second, m2))
                new_idx = jnp.where(m1 < best, b * TB + i1, idx)
                return new_best, new_second, new_idx

            init = (jnp.full((QB, 1), BIG, jnp.float32),
                    jnp.full((QB, 1), BIG, jnp.float32),
                    jnp.full((QB, 1), -1, jnp.int32))
            best, second, idx = jax.lax.fori_loop(0, n_live_tblocks, body,
                                                  init)
            best_ref[...] = jnp.broadcast_to(best, (QB, 128))
            second_ref[...] = jnp.broadcast_to(second, (QB, 128))
            idx_ref[...] = jnp.broadcast_to(idx, (QB, 128))

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(s1, s2, count1=None, count2=None, interpret: bool = False):
    """Running-top-2 Hamming matcher.

    Args:
      s1: [N1, 512] bf16 signed query bits (N1 % 128 == 0).
      s2: [N2, 512] bf16 signed train bits, invalid rows zeroed
        (N2 % 128 == 0).
      count1/count2: index of the last live row + 1 (pass the live count
        for prefix-compacted sets); work scales with these extents instead
        of the slot capacities.  Defaults to the capacities.

    Returns (best [N1] f32, second [N1] f32, index [N1] i32).
    """
    n1, n2 = s1.shape[0], s2.shape[0]
    assert n1 % QB == 0
    rem = (-n2) % TB
    if rem:
        s2 = jnp.pad(s2, ((0, rem), (0, 0)))  # zero rows: distance 243
        n2 += rem
    if count1 is None:
        count1 = n1
    if count2 is None:
        count2 = s2.shape[0]
    counts = jnp.stack([jnp.asarray(count1, jnp.int32),
                        jnp.asarray(count2, jnp.int32)])

    kernel = _make_kernel(n2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n1 // QB,),
        in_specs=[
            pl.BlockSpec((QB, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, LANES), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QB, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec((QB, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec((QB, 128), lambda i, *_: (i, 0)),
        ],
    )
    best, second, idx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n1, 128), jnp.float32),
            jax.ShapeDtypeStruct((n1, 128), jnp.float32),
            jax.ShapeDtypeStruct((n1, 128), jnp.int32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(counts, s1, s2)
    return best[:, 0], second[:, 0], idx[:, 0]
