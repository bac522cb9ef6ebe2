"""Distributed bundle adjustment: observations sharded over a device mesh.

The north-star distributed component (SURVEY.md §7 step 7): keyframes stay
replicated (camera state is tiny, [C, 6+]), observations — the bulk of the
problem — are partitioned across devices, and every reduction of the
matrix-free Schur CG (``slam/ba.py``) becomes a local segment-sum followed
by one ``psum`` over the mesh axis.  The per-CG-iteration communication is
two [C, 6] / [P, 3] all-reduces riding ICI; compute (Jacobian products over
the M/N local observations) scales linearly with devices.

The same LM loop as single-chip BA runs *inside* ``shard_map``, replicated
on every device; the psums keep all replicas bit-identical, so no separate
synchronisation is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry.se3 import se3_exp, se3_compose
from ..slam.ba import (BAProblem, _obs_jacobians, _schur_solve, ba_cost)


def pad_observations(prob: BAProblem, multiple: int) -> BAProblem:
    """Pad the observation list to a multiple (weight 0 padding rows)."""
    m = prob.cam.shape[0]
    rem = (-m) % multiple
    if rem == 0:
        return prob
    return BAProblem(
        cam=jnp.pad(prob.cam, (0, rem)),
        pt=jnp.pad(prob.pt, (0, rem)),
        uv=jnp.pad(prob.uv, ((0, rem), (0, 0))),
        w=jnp.pad(prob.w, (0, rem)))


def sharded_bundle_adjust(R, t, X, prob: BAProblem, mesh: Mesh,
                          iters: int = 8, cg_iters: int = 30,
                          lam0: float = 1e-3, axis: str = "data",
                          fixed_cam_mask=None):
    """LM bundle adjustment with observations sharded over ``mesh[axis]``.

    Args mirror ``slam.bundle_adjust``; ``prob`` must be padded to a multiple
    of the mesh axis size (see ``pad_observations``).  Returns
    (R, t, X, final_cost), all fully replicated.
    """
    n_cams = R.shape[0]
    n_pts = X.shape[0]
    n_dev = mesh.shape[axis]
    assert prob.cam.shape[0] % n_dev == 0, "pad observations first"
    if fixed_cam_mask is None:
        fixed_cam_mask = jnp.zeros(n_cams, bool).at[0].set(True)

    def local_cost(R, t, X, lprob):
        return jax.lax.psum(ba_cost(R, t, X, lprob), axis)

    # check_vma=False: the outputs are mathematically replicated (every
    # replica runs the identical psum-synchronised LM loop) but the vma type
    # system cannot prove it through lax.scan
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), BAProblem(P(axis), P(axis),
                                                P(axis), P(axis)), P()),
             out_specs=(P(), P(), P(), P()), check_vma=False)
    def run(R, t, X, lprob, fixed_mask):
        free = (~fixed_mask).astype(R.dtype)[:, None]

        def lm_step(state, _):
            R, t, X, lam = state
            r, Jc, Jp = _obs_jacobians(R, t, X, lprob)
            Jc = Jc * free[lprob.cam][:, :, None].transpose(0, 2, 1)
            dc, dp = _schur_solve(r, Jc, Jp, lprob, n_cams, n_pts, lam,
                                  cg_iters, psum_axis=axis)
            dc = dc * free
            dR, dt = se3_exp(dc)
            R2, t2 = se3_compose(R, t, dR, dt)
            X2 = X + dp
            c_old = local_cost(R, t, X, lprob)
            c_new = local_cost(R2, t2, X2, lprob)
            better = c_new < c_old
            R = jnp.where(better, R2, R)
            t = jnp.where(better, t2, t)
            X = jnp.where(better, X2, X)
            lam = jnp.where(better, lam * 0.5, lam * 4.0)
            return (R, t, X, jnp.clip(lam, 1e-9, 1e6)), c_new

        # the psum outputs are 'varying' over the mesh axis in shard_map's
        # type system; mark the (replicated) initial carry to match
        state = jax.lax.pcast((R, t, X, jnp.float32(lam0)), (axis,),
                              to="varying")
        (R, t, X, _), _ = jax.lax.scan(lm_step, state, None, length=iters)
        return R, t, X, local_cost(R, t, X, lprob)

    return jax.jit(run)(R, t, X, prob, fixed_cam_mask)
