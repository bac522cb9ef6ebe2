#!/bin/bash
# TPU measurement runbook: one command gathers the quality drive and
# every headline/flavour/stage number on the real chip.
# Results land in /tmp/r3_tpu/. ONE TPU process at a time (axon is
# single-client), so everything is sequential.
set -x
mkdir -p /tmp/r3_tpu
cd /root/repo

# 0. tunnel sanity
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. canonical verify drive (float + fixed)
timeout 580 python - <<'EOF' 2>&1 | tail -4 | tee /tmp/r3_tpu/verify_drive.txt
import numpy as np
from akaze_tpu import Akaze, AkazeConfig
from akaze_tpu.io import load_pgm
L = load_pgm('/root/reference/data/left.pgm')
A, B = L[100:612, 200:840], L[107:619, 213:853]
for fixed in (False, True):
    det = Akaze(AkazeConfig(max_pts=10000), fixed=fixed)
    Af, Bf = (A, B) if fixed else (A.astype(np.float32)/255, B.astype(np.float32)/255)
    fa, fb = det.detect_and_compute(Af), det.detect_and_compute(Bf)
    m = det.match(fa, fb)
    n = int(fa.count); acc = np.asarray(m.index[:n]) >= 0
    dx = np.asarray(m.match_x[:n])[acc] - np.asarray(fa.x[:n])[acc]
    dy = np.asarray(m.match_y[:n])[acc] - np.asarray(fa.y[:n])[acc]
    inl = ((np.abs(dx+13)<1.5)&(np.abs(dy+7)<1.5)).mean()
    print(f"fixed={fixed} n={n} acc={acc.sum()} med=({np.median(dx)},{np.median(dy)}) inlier={inl:.3f}")
EOF

# 2. headline
timeout 580 python bench.py 2>/dev/null | tee /tmp/r3_tpu/bench.json

# 3. per-flavour
timeout 580 python benchmarks/flavour_bench.py 2>/dev/null | tee /tmp/r3_tpu/flavours.json

# 4. stage profile
timeout 580 python benchmarks/profile_stages.py 2>/dev/null | tee /tmp/r3_tpu/stages.txt

# 5. spatial tier on the real chip: 1-device mesh exercises the
# Mosaic-kernels-inside-shard_map composition on hardware (multi-device
# needs a pod slice); keypoints must match the unsharded program
timeout 580 python - <<'EOF' 2>&1 | tail -3 | tee /tmp/r3_tpu/spatial_1dev.txt
import numpy as np, jax.numpy as jnp
from functools import partial
import jax
from akaze_tpu import AkazeConfig
from akaze_tpu.plan import build_plan
from akaze_tpu.pipeline import detect_and_compute
from akaze_tpu.parallel import make_mesh, spatial_detect_and_compute
from akaze_tpu.io import load_pgm
L = jnp.asarray(load_pgm('/root/reference/data/left.pgm').astype(np.float32)/255)
cfg = AkazeConfig(max_pts=10000)
plan = build_plan(*L.shape, cfg)
ref = jax.jit(partial(detect_and_compute, plan=plan))(L)
sp = jax.jit(partial(spatial_detect_and_compute, plan=plan,
                     mesh=make_mesh(1)))(L)
n = int(ref.count)
print("counts", n, int(sp.count))
wa = np.ascontiguousarray(np.asarray(ref.words)[:n]).view(np.uint8)
wb = np.ascontiguousarray(np.asarray(sp.words)[:n]).view(np.uint8)
print("descriptor bit diffs:", int(np.unpackbits(wa ^ wb).sum()))
EOF

echo RUNBOOK-DONE
