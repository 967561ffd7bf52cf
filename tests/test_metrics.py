"""PSNR + FLIP metric tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from neural_renderer_tpu.metrics import (
    calculate_ppd, compute_flip, compute_flip_map, compute_psnr,
    flip_vertically, load_image, save_png)
from neural_renderer_tpu.metrics.flip import (
    hunt_adjustment, hyab, linrgb_to_lab, srgb_to_ycxcz, xyz_to_ycxcz,
    ycxcz_to_xyz)


def test_psnr_identical():
    img = np.random.default_rng(0).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert compute_psnr(img, img) == 100.0


def test_psnr_known_value():
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.full((8, 8, 3), 10, np.uint8)
    # mse = 100 -> psnr = 10*log10(255^2/100) = 28.13
    assert compute_psnr(a, b) == pytest.approx(28.1308, abs=1e-3)


def test_psnr_shape_mismatch():
    with pytest.raises(ValueError):
        compute_psnr(np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8))


def test_ppd_default():
    # 0.7 * (3840/0.7) * pi/180 = 67.02
    assert calculate_ppd() == pytest.approx(67.0206, abs=1e-3)


def test_ycxcz_roundtrip():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.uniform(0.05, 0.9, (32, 3)), jnp.float32)
    back = ycxcz_to_xyz(xyz_to_ycxcz(xyz))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyz), atol=1e-5)


def test_ycxcz_white():
    # D65 white (linear RGB 1,1,1) -> Y=100, Cx=Cz=0.
    ycc = np.asarray(srgb_to_ycxcz(jnp.asarray([[1.0, 1.0, 1.0]])))
    np.testing.assert_allclose(ycc[0], [100.0, 0.0, 0.0], atol=1e-3)


def test_hyab_and_hunt():
    a = jnp.asarray([[50.0, 10.0, -10.0]])
    b = jnp.asarray([[40.0, 10.0, -10.0]])
    assert float(hyab(a, b)[0]) == pytest.approx(10.0)
    h = np.asarray(hunt_adjustment(jnp.asarray([[50.0, 20.0, -40.0]])))
    np.testing.assert_allclose(h[0], [50.0, 10.0, -20.0])


def test_flip_identical_is_zero():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(48, 64, 3)).astype(np.float32)
    err = np.asarray(compute_flip_map(img, img))
    assert err.shape == (48, 64)
    assert err.max() < 1e-5


def test_flip_range_and_monotonicity():
    rng = np.random.default_rng(3)
    ref = rng.uniform(size=(48, 64, 3)).astype(np.float32)
    small = np.clip(ref + 0.02, 0, 1)
    large = np.clip(ref + 0.35, 0, 1)
    e_small = float(np.asarray(compute_flip_map(ref, small)).mean())
    e_large = float(np.asarray(compute_flip_map(ref, large)).mean())
    assert 0.0 <= e_small <= 1.0
    assert 0.0 <= e_large <= 1.0
    assert e_large > e_small


def test_flip_u8_api(tmp_path):
    rng = np.random.default_rng(4)
    ref = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    test = np.clip(ref.astype(int) + 40, 0, 255).astype(np.uint8)
    out = str(tmp_path / "flip.png")
    mean, mx = compute_flip(ref, test, output_path=out)
    assert 0.0 < mean <= 1.0
    assert mean <= mx <= 1.0
    import os
    assert os.path.exists(out)


def test_image_io_roundtrip(tmp_path):
    img = np.random.default_rng(5).integers(0, 256, (10, 12, 3), dtype=np.uint8)
    path = str(tmp_path / "img.png")
    assert save_png(path, img)
    loaded = load_image(path)
    np.testing.assert_array_equal(loaded, img)
    flipped = flip_vertically(img)
    np.testing.assert_array_equal(flipped[0], img[-1])
