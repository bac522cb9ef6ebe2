import numpy as np
import jax
import jax.numpy as jnp
import pytest

from akaze_tpu import AkazeConfig
from akaze_tpu.plan import build_plan
from akaze_tpu.pipeline import detect_and_compute
from akaze_tpu.match import match
from akaze_tpu.parallel import make_mesh, dp_pipeline_step, sharded_match


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def test_dp_pipeline_matches_single_device(mesh8, test_image):
    h, w = 112, 128
    imgs_a = np.stack([test_image[i:i + h, i:i + w] for i in range(8)])
    imgs_b = np.stack([test_image[i + 3:i + 3 + h, i + 5:i + 5 + w]
                       for i in range(8)])
    cfg = AkazeConfig(max_pts=256, noctaves=2)
    plan = build_plan(h, w, cfg)
    fa, fb, m = dp_pipeline_step(imgs_a, imgs_b, plan, mesh8)
    # compare batch element 3 against the unsharded single-frame pipeline
    # vmap changes fusion order -> tiny fp drift is expected; positions must
    # agree to well below a hundredth of a pixel and descriptor bits must be
    # near-identical (rare near-tie comparisons may flip)
    ref = detect_and_compute(jnp.asarray(imgs_a[3]), plan)
    assert int(fa.count[3]) == int(ref.count)
    np.testing.assert_allclose(np.asarray(fa.x[3]), np.asarray(ref.x),
                               atol=1e-3)
    w_dp = np.asarray(fa.words[3]).view(np.uint8)
    w_ref = np.asarray(ref.words).view(np.uint8)
    bit_diff = np.unpackbits(w_dp ^ w_ref).sum()
    assert bit_diff <= 4
    ref_m = match(ref.words, ref.valid,
                  *(detect_and_compute(jnp.asarray(imgs_b[3]), plan)[i]
                    for i in (6, 7, 0, 1)), cfg.max_dist)
    agree = (np.asarray(m.index[3]) == np.asarray(ref_m.index)).mean()
    assert agree > 0.99


def test_sharded_match_equals_local(mesh8):
    rng = np.random.default_rng(0)
    n = 256
    words1 = rng.integers(0, 2**32, (n, 16), dtype=np.uint32)
    words2 = rng.integers(0, 2**32, (n, 16), dtype=np.uint32)
    # zero the pad bits (lanes 486..511 of word 15)
    words1[:, 15] &= (1 << 6) - 1
    words2[:, 15] &= (1 << 6) - 1
    v = np.ones(n, bool)
    x = rng.uniform(0, 100, n).astype(np.float32)
    y = rng.uniform(0, 100, n).astype(np.float32)
    local = match(jnp.asarray(words1), jnp.asarray(v), jnp.asarray(words2),
                  jnp.asarray(v), jnp.asarray(x), jnp.asarray(y), 486)
    shard = sharded_match(jnp.asarray(words1), jnp.asarray(v),
                          jnp.asarray(words2), jnp.asarray(v),
                          jnp.asarray(x), jnp.asarray(y), mesh8,
                          max_dist=486)
    np.testing.assert_array_equal(np.asarray(local.index),
                                  np.asarray(shard.index))
    np.testing.assert_array_equal(np.asarray(local.distance),
                                  np.asarray(shard.distance))
