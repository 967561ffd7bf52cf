"""Renderer.render_accumulate: the in-jit multi-batch accumulation path.

The evaluate CLI's host-side per-batch loop paid a fixed dispatch floor per
batch (measured 2854 s wall for ~5 s of device compute, BASELINE.md round 4);
render_accumulate chains batches with a lax.fori_loop inside one dispatch per
chunk. These tests pin its contract: same image as the sequential render()
loop (evaluate.cu:253-264 semantics), chunking invariance, and the state the
renderer is left in.
"""

import numpy as np
import pytest

from neural_renderer_tpu.config import NeuralNetworkConfig
from neural_renderer_tpu.render import RenderBasis, Renderer
from neural_renderer_tpu.scene.mesh_loader import generate_uv_sphere
from neural_renderer_tpu.scene.scene import Scene


def _outward(stacks, slices, r):
    m = generate_uv_sphere(stacks, slices, r)
    m.indices = m.indices[:, [0, 2, 1]].copy()
    m.mark_dirty()
    return m


@pytest.fixture(scope="module")
def scene():
    s = Scene()
    s.original_mesh = _outward(12, 24, 1.0)
    s.inner_shell = _outward(8, 16, 0.85)
    s.outer_shell = _outward(8, 16, 1.15)
    return s


def _make_renderer(scene, w=64, h=32):
    r = Renderer(scene, NeuralNetworkConfig(grid_type="lane"))
    r.resize(w, h)
    r.set_bounce_count(2)
    r.set_camera_basis(RenderBasis(np.array([0.0, 0.0, -1.0]),
                                   np.array([1.0, 0.0, 0.0]),
                                   np.array([0.0, 1.0, 0.0]), 0.9))
    return r


POS = np.array([0.0, 0.0, 3.0])


def _host_loop_image(renderer, total, spp):
    renderer.reset_samples()
    renderer.set_samples_per_pixel(spp)
    img = None
    for _ in range(total // spp):
        img = renderer.render(POS)
    return img


@pytest.mark.parametrize("neural", [False, True])
def test_matches_host_loop(scene, neural):
    r = _make_renderer(scene)
    r.set_use_neural_query(neural)
    ref = _host_loop_image(r, 4, 1)
    ref_accum = np.asarray(r._accum)

    got = r.render_accumulate(POS, 4, batch_spp=1)
    np.testing.assert_allclose(np.asarray(r._accum), ref_accum,
                               rtol=1e-5, atol=1e-5)
    # u8 image: identical up to one code from accumulation-order rounding.
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    assert r.accum_sample_count == 4


def test_chunking_invariant(scene):
    r = _make_renderer(scene)
    r.set_use_neural_query(False)
    one = r.render_accumulate(POS, 4, batch_spp=1, chunk_batches=64)
    per = r.render_accumulate(POS, 4, batch_spp=1, chunk_batches=1)
    np.testing.assert_array_equal(one, per)


def test_progress_and_validation(scene):
    r = _make_renderer(scene)
    r.set_use_neural_query(False)
    ticks = []
    r.render_accumulate(POS, 4, batch_spp=1, chunk_batches=2,
                        progress=lambda done, total: ticks.append((done, total)))
    assert ticks == [(2, 4), (4, 4)]

    with pytest.raises(ValueError):
        r.render_accumulate(POS, 5, batch_spp=2)
    r.set_denoise(True)
    with pytest.raises(ValueError):
        r.render_accumulate(POS, 4, batch_spp=1)


def test_batch_spp_matches_spp1(scene):
    # 4 samples as 2 batches of spp=2 equals 4 batches of spp=1: the RNG
    # stream is keyed by (pixel, sample_offset + lane) either way.
    r = _make_renderer(scene)
    r.set_use_neural_query(False)
    a = r.render_accumulate(POS, 4, batch_spp=1)
    acc1 = np.asarray(r._accum)
    b = r.render_accumulate(POS, 4, batch_spp=2)
    np.testing.assert_allclose(np.asarray(r._accum), acc1, rtol=1e-5, atol=1e-5)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
