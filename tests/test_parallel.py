"""Multi-chip sharding: dp-sharded render must be bit-identical to
single-chip; sp-sharded must be statistically equivalent (SURVEY.md §2.6).

Needs >= 8 devices (virtual CPU devices via conftest env, or run with
`PYTHONPATH= JAX_PLATFORMS=cpu
 XLA_FLAGS=--xla_force_host_platform_device_count=8 pytest ...`
in environments whose site hooks pin another platform)."""

import numpy as np
import pytest
import jax

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.presets import rtiow_smoke_scene
from dsrt_tpu.ops.camera import make_camera

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 devices (virtual CPU mesh)")

W, H = 40, 24
CFG = RenderConfig(width=W, height=H, spp=4, max_depth=6)


@pytest.fixture(scope="module")
def setup():
    scene = rtiow_smoke_scene()
    cam = make_camera((0, 0.4, 1.5), (0, 0, -1), vfov=55, width=W, height=H)
    from dsrt_tpu.render import render_frame
    ref = render_frame(scene, cam, CFG)
    return scene, cam, ref


@needs8
def test_dp_sharded_bit_identical(setup):
    from dsrt_tpu.parallel.mesh import make_mesh
    from dsrt_tpu.parallel.render import render_frame_sharded
    scene, cam, ref = setup
    img = render_frame_sharded(scene, cam, CFG, make_mesh(8, sp=1))
    np.testing.assert_array_equal(img, ref)


@needs8
def test_sp_sharded_statistically_close(setup):
    from dsrt_tpu.parallel.mesh import make_mesh
    from dsrt_tpu.parallel.render import render_frame_sharded
    scene, cam, ref = setup
    img = render_frame_sharded(scene, cam, CFG, make_mesh(8, sp=2))
    diff = np.abs(img.astype(int) - ref.astype(int))
    assert diff.mean() < 12.0  # MC noise at 4 spp, not a systematic offset
    assert (img > 0).mean() > 0.3  # actually rendered content


@needs8
def test_spp_not_divisible_raises(setup):
    from dsrt_tpu.parallel.mesh import make_mesh
    from dsrt_tpu.parallel.render import render_frame_sharded
    scene, cam, _ = setup
    cfg = RenderConfig(width=W, height=H, spp=3, max_depth=4)
    with pytest.raises(ValueError):
        render_frame_sharded(scene, cam, cfg, make_mesh(8, sp=2))


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    assert out.shape == (72, 128, 3)


@needs8
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
