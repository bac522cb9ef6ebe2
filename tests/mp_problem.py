"""Deterministic BA problem shared by the multi-process parity test's
parent (test_multiprocess.py) and workers (mp_worker.py)."""

import numpy as np


def make_problem(n_cams: int = 5, n_pts: int = 48):
    import jax.numpy as jnp
    from akaze_tpu.geometry import se3_exp, se3_inverse
    from akaze_tpu.slam.ba import BAProblem

    rng = np.random.default_rng(1234)
    X = rng.uniform([-2, -2, 6], [2, 2, 12], (n_pts, 3)).astype(np.float32)
    Rs, ts = [], []
    for c in range(n_cams):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.4 * c
        xi[4] = 0.03 * c
        R, t = se3_exp(jnp.asarray(xi))
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
    prob = BAProblem(cam=jnp.asarray(cams, jnp.int32),
                     pt=jnp.asarray(pts, jnp.int32),
                     uv=jnp.asarray(np.asarray(uvs, np.float32)),
                     w=jnp.ones(len(cams), jnp.float32))
    X0 = X + rng.standard_normal(X.shape).astype(np.float32) * 0.04
    return jnp.asarray(R), jnp.asarray(t), jnp.asarray(X0), prob
