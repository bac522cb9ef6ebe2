"""Pose-graph optimization (PGO) on SE(3), matrix-free Gauss-Newton.

State: N poses (R [N, 3, 3], t [N, 3]) in SoA form.  Constraints: E relative
pose edges (i, j, measured T_ij, scalar weight).  The residual of an edge is

    r_e = w_e * log( T_ij^-1 * T_i^-1 * T_j )   in se(3), [6]

The Gauss-Newton normal equations are never materialised: `jax.linearize`
gives J.v products and its transpose gives J^T.u, and the damped system
(J^T J + lam I) dx = -J^T r is solved with conjugate gradients.  Everything
is gather/segment-sum shaped, so the same code jits on CPU/TPU and shards
over an edge-partitioned mesh by wrapping the matvec in ``psum``.

The gauge freedom is fixed by zeroing the update of pose 0 (an explicit
projection inside the matvec, equivalent to deleting its rows/columns).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import se3_exp, se3_log, se3_compose, se3_inverse


class PoseGraph(NamedTuple):
    """Edge-list pose graph in SoA form (statically shaped; pad unused edge
    slots with weight 0)."""
    i: jax.Array       # [E] int32 source node
    j: jax.Array       # [E] int32 target node
    R_ij: jax.Array    # [E, 3, 3] measured relative rotation
    t_ij: jax.Array    # [E, 3] measured relative translation
    weight: jax.Array  # [E] float32 (sqrt information scalar; 0 = disabled)


def _retract(R, t, xi):
    """Right-multiplicative manifold update: T_i <- T_i * exp(xi_i)."""
    dR, dt = se3_exp(xi)
    return se3_compose(R, t, dR, dt)


def _edge_residuals(R, t, g: PoseGraph):
    Ri, ti = R[g.i], t[g.i]
    Rj, tj = R[g.j], t[g.j]
    Rinv, tinv = se3_inverse(Ri, ti)
    Rrel, trel = se3_compose(Rinv, tinv, Rj, tj)          # T_i^-1 T_j
    Rm_inv, tm_inv = se3_inverse(g.R_ij, g.t_ij)
    Re, te = se3_compose(Rm_inv, tm_inv, Rrel, trel)       # T_ij^-1 ...
    return se3_log(Re, te) * g.weight[:, None]             # [E, 6]


def pose_graph_cost(R, t, g: PoseGraph):
    r = _edge_residuals(R, t, g)
    return 0.5 * jnp.sum(r * r)


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_pose_graph(R, t, graph: PoseGraph, iters: int = 10,
                        cg_iters: int = 50, damping: float = 1e-6,
                        fixed_mask=None):
    """Gauss-Newton PGO.

    Args:
      R, t: initial poses [N, 3, 3], [N, 3].
      graph: edge constraints.
      iters: outer Gauss-Newton iterations (static).
      cg_iters: CG iterations per GN step (static).
      damping: Levenberg lambda added to the normal matrix diagonal.
      fixed_mask: [N] bool, True for gauge-fixed poses (default: pose 0).

    Returns: (R, t, final_cost).
    """
    n = R.shape[0]
    if fixed_mask is None:
        fixed_mask = jnp.zeros(n, bool).at[0].set(True)
    free = (~fixed_mask).astype(R.dtype)[:, None]

    def gn_step(state, _):
        R, t = state

        def r_of_xi(xi):
            R2, t2 = _retract(R, t, xi * free)
            return _edge_residuals(R2, t2, graph)

        xi0 = jnp.zeros((n, 6), R.dtype)
        r0, jvp = jax.linearize(r_of_xi, xi0)
        vjp = jax.linear_transpose(jvp, xi0)

        def matvec(v):
            (jtjv,) = vjp(jvp(v))
            return jtjv + damping * v

        (g,) = vjp(r0)
        dx, _ = jax.scipy.sparse.linalg.cg(matvec, -g, maxiter=cg_iters)
        dx = dx * free
        R2, t2 = _retract(R, t, dx)
        # accept only if the cost decreases (cheap trust region)
        c_old = pose_graph_cost(R, t, graph)
        c_new = pose_graph_cost(R2, t2, graph)
        better = c_new < c_old
        R = jnp.where(better, R2, R)
        t = jnp.where(better, t2, t)
        return (R, t), c_new

    (R, t), costs = jax.lax.scan(gn_step, (R, t), None, length=iters)
    return R, t, pose_graph_cost(R, t, graph)
