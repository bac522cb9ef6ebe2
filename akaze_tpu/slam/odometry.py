"""Keyframe-based visual odometry: AKAZE front-end + RANSAC two-view pose
+ triangulated local map + local bundle adjustment.

This is the host-side orchestration layer (the analogue of the reference's
``Akazer`` state machine, akaze.cpp:101-201, but for a *sequence*): each
jitted step — detect+describe, match, RANSAC, triangulate, BA — runs as one
XLA program over fixed-capacity tensors; Python only sequences keyframe
decisions between them.

Monocular scale: the first two-view baseline defines the unit; subsequent
relative translations are scaled so re-triangulated common landmarks agree
in depth (median-depth-ratio scale propagation).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AkazeConfig
from ..geometry import (ransac_essential, triangulate, se3_compose,
                        se3_inverse)
from ..geometry.ransac import normalize_points
from ..match import match
from ..pipeline import Akaze, Features
from .ba import BAProblem, bundle_adjust


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    fx: float
    fy: float
    cx: float
    cy: float


class Keyframe(NamedTuple):
    index: int            # frame index in the sequence
    features: Features
    R: np.ndarray         # [3, 3] world -> camera
    t: np.ndarray         # [3]
    # per-slot METRIC landmark depths in this keyframe's camera (seeded
    # from the matched triangulation at keyframe creation), and their
    # validity.  Loop closures measure their translation MAGNITUDE from
    # these (depth-ratio baseline), so loop edges pull drifted poses back
    # together instead of freezing the drift into the measurement.  None
    # when unavailable (first keyframe, tracking-failure keyframes).
    z: np.ndarray = None
    z_ok: np.ndarray = None


@partial(jax.jit, static_argnames=("num_hyps",))
def _two_view(key, f1: Features, f2: Features, fx, fy, cx, cy,
              threshold, num_hyps: int = 512):
    """Match + RANSAC essential + triangulation, one jitted program.

    Returns (m, res, X1, z1, z2): matches of f1 against f2, the RANSAC
    result (pose maps camera-1 points into camera-2), and landmark estimates
    in camera-1 coordinates for every query slot.
    """
    m = match(f1.words, f1.valid, f2.words, f2.valid, f2.x, f2.y)
    x1 = normalize_points(jnp.stack([f1.x, f1.y], -1), fx, fy, cx, cy)
    x2 = normalize_points(jnp.stack([m.match_x, m.match_y], -1),
                          fx, fy, cx, cy)
    putative = (m.index >= 0) & f1.valid
    res = ransac_essential(key, x1, x2, putative, threshold=threshold,
                           num_hyps=num_hyps)
    X1, z1, z2 = triangulate(res.R, res.t, x1, x2)
    return m, res, X1, z1, z2


class VisualOdometry:
    """Incremental monocular odometry over a frame stream.

    Usage::

        vo = VisualOdometry(Intrinsics(fx, fy, cx, cy))
        for img in frames:
            pose = vo.process(img)     # (R, t) world->camera, np arrays
        traj = vo.trajectory()          # [N, 3] camera centers
    """

    def __init__(self, intr: Intrinsics,
                 config: Optional[AkazeConfig] = None,
                 ransac_threshold: float = 2e-5,
                 min_inliers: int = 30,
                 keyframe_inlier_ratio: float = 0.6,
                 seed: int = 0,
                 local_ba_window: int = 5,
                 mesh=None):
        """``mesh``: optional device mesh with a ``data`` axis — frames big
        enough for the row-sharded spatial tier run detection sharded over
        it; smaller frames fall back to the single-chip program (see
        ``Akaze(spatial_fallback=True)``)."""
        self.intr = intr
        self.akaze = Akaze(config or AkazeConfig(max_pts=4000),
                           mesh=mesh, spatial_fallback=True)
        self.threshold = ransac_threshold
        self.min_inliers = min_inliers
        self.kf_ratio = keyframe_inlier_ratio
        self.local_ba_window = local_ba_window
        self._key = jax.random.PRNGKey(seed)
        self.keyframes: List[Keyframe] = []
        self.poses: List[tuple] = []       # per-frame (R, t) world->camera
        # detection-capacity loss surfaced into the product path (r3 verdict
        # item 8): True when the LAST processed frame dropped NMS survivors
        # (Features.overflow), plus the frame indices where it happened —
        # the reference clamps silently at max_pts (akaze.cpp:451)
        self.last_overflow = False
        self.overflow_frames: List[int] = []
        self._frame_idx = 0
        self._kf_inliers0 = None           # inlier count right after a new kf
        self._scale = 1.0
        self._last_depth_med = None
        # per-kf-slot depths of the previous frame's triangulation (against
        # the SAME keyframe), for per-landmark scale ratios
        self._last_z = None
        self._last_z_ok = None

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def process(self, image) -> tuple:
        """Ingest one frame; returns its (R, t) world->camera pose."""
        feats = self.akaze.detect_and_compute(image)
        self.last_overflow = (feats.overflow is not None
                              and bool(feats.overflow))
        if self.last_overflow:
            self.overflow_frames.append(self._frame_idx)
        intr = self.intr
        if not self.keyframes:
            R = np.eye(3, dtype=np.float32)
            t = np.zeros(3, np.float32)
            self.keyframes.append(Keyframe(self._frame_idx, feats, R, t))
            self.poses.append((R, t))
            self._frame_idx += 1
            return R, t

        kf = self.keyframes[-1]
        m, res, X1, z1, z2 = _two_view(
            self._next_key(), kf.features, feats,
            intr.fx, intr.fy, intr.cx, intr.cy, self.threshold)
        n_inl = int(res.num_inliers)
        inl = np.asarray(res.inliers)

        if n_inl < self.min_inliers:
            # tracking failure: hold the last pose (fail-soft; the reference
            # clamps on overflow similarly rather than aborting)
            R, t = self.poses[-1]
            self.poses.append((R, t))
            self.keyframes.append(Keyframe(self._frame_idx, feats,
                                           np.asarray(R), np.asarray(t)))
            self._kf_inliers0 = None
            # the next depth median will be measured against a *new*
            # keyframe baseline; a ratio across the gap would be garbage
            self._last_depth_med = None
            self._last_z = None
            self._frame_idx += 1
            return R, t

        # scale propagation: triangulation against the keyframe normalises
        # the baseline to 1, so a landmark's triangulated depth scales as
        # z = z_metric / baseline.  ``_last_z`` carries per-keyframe-slot
        # METRIC depths (in the keyframe camera); the per-landmark ratio
        # z_metric[i] / z_now[i] over slots inlying in both frames then
        # measures the metric baseline directly, with the scene structure
        # cancelled pairwise.  This replaces the old ratio-of-medians over
        # *changing* inlier sets (several % of scale noise per frame as the
        # view rotates — a random walk that dominated long-sequence ATE)
        # AND the keyframe-handover sawtooth (the committed scale was the
        # multi-frame baseline to the old keyframe, reused as the next
        # single-frame step): new keyframes are seeded with metric depths
        # via the matched z2 below, so the first post-keyframe step is
        # measured, not guessed.  Median-of-medians stays as the fallback
        # when too few slots survive in both frames.
        z_all = np.asarray(z1)
        ok = inl & (z_all > 0)
        z = z_all[inl]
        depth_med = float(np.median(z[z > 0])) if (z > 0).any() else None
        scale = self._scale
        if self._last_z is not None:
            common = ok & self._last_z_ok
            if common.sum() >= 8:
                scale = float(np.median(self._last_z[common]
                                        / z_all[common]))
            elif self._last_depth_med and depth_med:
                scale = (self._scale * self._last_depth_med
                         / max(depth_med, 1e-6))
            scale = float(np.clip(scale, 0.1 * self._scale,
                                  10.0 * self._scale))
        elif self._last_depth_med and depth_med:
            scale = self._scale * self._last_depth_med / max(depth_med, 1e-6)
            scale = float(np.clip(scale, 0.1 * self._scale,
                                  10.0 * self._scale))
        # metric depths of this triangulation, for the next frame's ratio
        self._last_z = z_all * scale
        self._last_z_ok = ok

        # compose: T_cur_world = T_rel * T_kf_world
        R_rel = np.asarray(res.R)
        t_rel = np.asarray(res.t) * scale
        R = R_rel @ kf.R
        t = R_rel @ kf.t + t_rel
        self.poses.append((R.astype(np.float32), t.astype(np.float32)))

        if self._kf_inliers0 is None:
            self._kf_inliers0 = max(n_inl, 1)
        if n_inl < self.kf_ratio * self._kf_inliers0:
            # seed the NEW keyframe's slots with metric depths: z2 is the
            # depth in camera-2 (= this frame = the new keyframe) of each
            # matched landmark at unit baseline, and m.index maps old-kf
            # slots to this frame's slots.  The next frame's per-landmark
            # ratio then measures its metric baseline from the new
            # keyframe directly (no handover sawtooth), and loop closures
            # measure their baseline against these depths.
            midx = np.asarray(m.index)
            z2_m = np.asarray(z2) * scale
            n_slots = z_all.shape[0]
            zref = np.zeros(n_slots, np.float32)
            zok = np.zeros(n_slots, bool)
            sel = ok & (midx >= 0) & (z2_m > 0)
            tgt = midx[sel]
            zref[tgt] = z2_m[sel]
            zok[tgt] = True
            self.keyframes.append(Keyframe(
                self._frame_idx, feats, R.astype(np.float32),
                t.astype(np.float32), zref, zok))
            self._kf_inliers0 = None
            self._scale = scale
            self._last_depth_med = None
            self._last_z = zref
            self._last_z_ok = zok
        else:
            # commit scale alongside the rolling depth median so the
            # telescoped product stays anchored at the keyframe epoch
            # (scale_k = s_kf * med_0 / med_k, not med_{k-1}/med_k)
            self._scale = scale
            self._last_depth_med = depth_med
        self._frame_idx += 1
        return self.poses[-1]

    def trajectory(self) -> np.ndarray:
        """[N, 3] camera centers c = -R^T t."""
        out = []
        for R, t in self.poses:
            out.append(-(np.asarray(R).T @ np.asarray(t)))
        return np.stack(out) if out else np.zeros((0, 3), np.float32)


def build_local_ba(kf_feats: List[Features], kf_poses, intr: Intrinsics,
                   max_pts: int, matches_fn=None):
    """Build a BAProblem from a window of keyframes by chaining matches
    from each keyframe to the next (track stitching on host).

    Returns (R [C,3,3], t [C,3], X0 [P,3], BAProblem) ready for
    ``bundle_adjust``.  Landmarks are seeded by triangulating each track's
    first two observations.
    """
    c = len(kf_feats)
    assert c >= 2
    fx, fy, cx, cy = intr.fx, intr.fy, intr.cx, intr.cy

    # pairwise consecutive matches (matches_fn injectable for testing:
    # takes (f1, f2), returns an [N] int index array, -1 = unmatched)
    if matches_fn is None:
        def matches_fn(f1, f2):
            return match(f1.words, f1.valid, f2.words, f2.valid,
                         f2.x, f2.y).index
    pair_matches = []
    for a in range(c - 1):
        pair_matches.append(
            np.asarray(matches_fn(kf_feats[a], kf_feats[a + 1])))

    # track stitching: track id = (kf0 slot) propagated forward
    npts = int(np.asarray(kf_feats[0].valid).sum())
    track_of = [dict() for _ in range(c)]  # slot -> track id per kf
    tracks = []                             # list of [(kf, slot), ...]
    for s in range(kf_feats[0].x.shape[0]):
        if bool(np.asarray(kf_feats[0].valid)[s]):
            track_of[0][s] = len(tracks)
            tracks.append([(0, s)])
    for a in range(c - 1):
        idx = pair_matches[a]
        for s, tid in list(track_of[a].items()):
            j = int(idx[s])
            if j < 0:
                continue
            if j in track_of[a + 1]:
                # two tracks matched into the same next-keyframe slot:
                # first-wins — the later claim is dropped so one image
                # measurement never constrains two landmarks
                continue
            track_of[a + 1][j] = tid
            if len(tracks[tid]) and tracks[tid][-1][0] == a:
                tracks[tid].append((a + 1, j))

    # keep tracks with >= 2 observations
    cams, pts, uvs = [], [], []
    X0 = []
    pid = 0
    xs = [np.stack([np.asarray(f.x), np.asarray(f.y)], -1) for f in kf_feats]
    Rs = np.stack([np.asarray(p[0]) for p in kf_poses])
    ts = np.stack([np.asarray(p[1]) for p in kf_poses])
    for obs in tracks:
        if len(obs) < 2:
            continue
        (a, sa), (b, sb) = obs[0], obs[1]
        xa = normalize_points(jnp.asarray(xs[a][sa]), fx, fy, cx, cy)
        xb = normalize_points(jnp.asarray(xs[b][sb]), fx, fy, cx, cy)
        # relative pose a -> b
        Rbi, tbi = Rs[b], ts[b]
        Rai_inv, tai_inv = se3_inverse(jnp.asarray(Rs[a]),
                                       jnp.asarray(ts[a]))
        Rab, tab = se3_compose(jnp.asarray(Rbi), jnp.asarray(tbi),
                               Rai_inv, tai_inv)
        Xa, z1, z2 = triangulate(Rab, tab, xa[None], xb[None])
        if float(z1[0]) <= 0:
            continue
        # to world coords: X_w = R_a^T (X_a - t_a)
        Xw = np.asarray(Rs[a]).T @ (np.asarray(Xa[0]) - ts[a])
        X0.append(Xw)
        for (k, s) in obs:
            cams.append(k)
            pts.append(pid)
            u = normalize_points(jnp.asarray(xs[k][s]), fx, fy, cx, cy)
            uvs.append(np.asarray(u))
        pid += 1
        if pid >= max_pts:
            break
    if pid == 0:
        raise ValueError("no tracks with >= 2 observations")
    prob = BAProblem(cam=jnp.asarray(cams, jnp.int32),
                     pt=jnp.asarray(pts, jnp.int32),
                     uv=jnp.asarray(np.stack(uvs), jnp.float32),
                     w=jnp.ones(len(cams), jnp.float32))
    return (jnp.asarray(Rs), jnp.asarray(ts),
            jnp.asarray(np.stack(X0), jnp.float32), prob)
