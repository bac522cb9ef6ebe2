"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite is cluster-free (SURVEY.md §4) and sharding code paths are exercised
without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment's sitecustomize may pin JAX_PLATFORMS to a TPU plugin;
# override explicitly so tests are cluster-free
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated on the 1-CPU
# test machine; caching compiled programs across runs/processes cuts repeat
# wall time by a large factor
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    """Fresh deterministic generator PER TEST: a session-scoped stream
    makes every test's data depend on which tests ran before it (adding a
    test reshuffles all downstream draws — an order-dependence that once
    flipped a RANSAC test), so each test draws from its own seed-42
    stream."""
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def test_image():
    """Small synthetic test image with blob structure (float in [0, 1])."""
    rng = np.random.default_rng(42)
    h, w = 192, 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    centers = rng.uniform(20, 170, size=(25, 2))
    centers[:, 1] = rng.uniform(20, 236, size=25)
    for (cy, cx), s, a in zip(centers, rng.uniform(2, 9, 25),
                              rng.uniform(0.3, 1.0, 25)):
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img += 0.05 * rng.standard_normal((h, w))
    img = np.clip(img, 0, 1)
    return img.astype(np.float32)


@pytest.fixture(scope="session")
def stereo_pair():
    """The reference's stock stereo pair if available, else None."""
    base = "/root/reference/data"
    left, right = os.path.join(base, "left.pgm"), os.path.join(
        base, "right.pgm")
    if not (os.path.exists(left) and os.path.exists(right)):
        pytest.skip("reference stereo pair unavailable")
    from akaze_tpu.io import load_pgm
    return load_pgm(left), load_pgm(right)
