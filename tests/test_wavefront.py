"""Wavefront-regeneration renderer: statistical equivalence with the
parity renderer, determinism, and exact ray accounting."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.presets import rtiow_smoke_scene, sphere_light_scene
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.render import render_frame, render_frame_wavefront

W, H = 48, 32


@pytest.fixture(scope="module")
def smoke():
    return rtiow_smoke_scene()


@pytest.fixture(scope="module")
def cam():
    return make_camera((0, 0.4, 1.5), (0, 0, -1), vfov=55, width=W, height=H)


@pytest.mark.slow
def test_wavefront_statistically_matches_parity(smoke, cam):
    cfg = RenderConfig(width=W, height=H, spp=64, max_depth=10)
    ref = render_frame(smoke, cam, cfg)
    wf = render_frame_wavefront(smoke, cam, cfg, spp_batch=4)
    d = wf.astype(float) - ref.astype(float)
    # unbiased: tiny mean signed difference; bounded MC noise
    assert abs(d.mean()) < 1.0, d.mean()
    assert np.abs(d).mean() < 6.0


@pytest.mark.slow
def test_wavefront_deterministic(smoke, cam):
    cfg = RenderConfig(width=W, height=H, spp=8, max_depth=6)
    a = render_frame_wavefront(smoke, cam, cfg, spp_batch=4)
    b = render_frame_wavefront(smoke, cam, cfg, spp_batch=4)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_wavefront_light_scene(cam):
    scene = sphere_light_scene()
    cfg = RenderConfig(width=W, height=H, spp=32, max_depth=10)
    ref = render_frame(scene, cam, cfg)
    wf = render_frame_wavefront(scene, cam, cfg, spp_batch=4)
    d = wf.astype(float) - ref.astype(float)
    assert abs(d.mean()) < 1.5


def test_wavefront_bad_batch_raises(smoke, cam):
    cfg = RenderConfig(width=W, height=H, spp=6, max_depth=4)
    with pytest.raises(ValueError):
        render_frame_wavefront(smoke, cam, cfg, spp_batch=4)


@pytest.mark.slow
def test_ray_counting_consistent(smoke, cam):
    """count_rays=True must not change radiance, and the count must be
    positive and plausible (>= spp * valid pixels primaries)."""
    from dsrt_tpu.ops.wavefront import trace_accumulate
    from dsrt_tpu.render import lane_layout

    cfg = RenderConfig(width=W, height=H, spp=4, max_depth=6)
    px, py, valid, _ = lane_layout(W, H)
    px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)
    slot = jnp.zeros(px.shape, jnp.uint32)

    f = jax.jit(lambda s, px, py, v, sl: trace_accumulate(
        s, cfg, cam, px, py, v, sl, 4, count_rays=True))
    a1, n1 = f(smoke, px, py, valid, slot)
    g = jax.jit(lambda s, px, py, v, sl: trace_accumulate(
        s, cfg, cam, px, py, v, sl, 4, count_rays=False))
    a2, _ = g(smoke, px, py, valid, slot)
    np.testing.assert_array_equal(np.asarray(a1.x), np.asarray(a2.x))
    assert int(n1) >= int(valid.sum()) * 4  # at least the primary rays


@pytest.mark.slow
def test_dof_render_differs_and_is_deterministic(smoke):
    """aperture > 0 engages the thin-lens path (reference camera.h:35-61)."""
    cam_d = make_camera((0, 0.4, 1.5), (0, 0, -1), vfov=55, width=W,
                        height=H, aperture=0.4)
    cfg0 = RenderConfig(width=W, height=H, spp=8, max_depth=6)
    cfg_d = RenderConfig(width=W, height=H, spp=8, max_depth=6, aperture=0.4)
    pin = render_frame(smoke, cam_d, cfg0)
    dof = render_frame(smoke, cam_d, cfg_d)
    assert (pin != dof).any()  # defocus changes the image
    dof2 = render_frame(smoke, cam_d, cfg_d)
    np.testing.assert_array_equal(dof, dof2)


@pytest.mark.slow
def test_queue_renderer_statistically_matches(smoke, cam):
    from dsrt_tpu.render import render_frame_queue
    cfg = RenderConfig(width=W, height=H, spp=32, max_depth=10)
    ref = render_frame(smoke, cam, cfg)
    q = render_frame_queue(smoke, cam, cfg)
    d = q.astype(float) - ref.astype(float)
    assert abs(d.mean()) < 1.5
    q2 = render_frame_queue(smoke, cam, cfg)
    np.testing.assert_array_equal(q, q2)


@pytest.mark.slow
def test_queue_banding_is_identical(smoke, cam):
    """Auto-banding (render.render_frame_queue) must produce exactly the
    unbanded image: per-pixel LCG seeds use true frame coordinates."""
    import dsrt_tpu.render as R
    cfg = RenderConfig(width=W, height=H, spp=4, max_depth=8)
    whole = R.render_frame_queue(smoke, cam, cfg)
    # force two bands by rendering them directly through the banded kernel
    band_h = H // 2
    top = np.asarray(jax.device_get(
        R._render_queue(smoke, cam, cfg, 2, band_h, H - band_h)))
    bot = np.asarray(jax.device_get(
        R._render_queue(smoke, cam, cfg, 2, 0, band_h)))
    banded = np.concatenate([top, bot], axis=0)
    np.testing.assert_array_equal(banded, whole)
