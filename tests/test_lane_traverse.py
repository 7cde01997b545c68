"""Per-lane stackless XLA traversal (ops/trace.py lane_traverse).

The XLA fallback for scenes too big for packet traversal (a 1024-lane
packet's union walk visits nearly the whole tree once bounce waves
decohere; at 40k tris one frame exceeded the TPU worker's execution
watchdog).  These tests force the lane path on SMALL scenes and hold it
to the same bar as every other traversal generation: u8-exact against
the scalar NumPy oracle, and t/u/v/tri-identical to the packet walk on
random rays.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dsrt_tpu.ops.trace as tracemod
from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from dsrt_tpu.models.presets import (random_tri_soup_scene,
                                     single_triangle_scene)
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.ops.linalg import V3
from dsrt_tpu.oracle import render_oracle
from dsrt_tpu.render import render_frame

CFG = RenderConfig(width=32, height=24, spp=2, max_depth=6)
CAM = dict(vfov=50, width=32, height=24)


@pytest.fixture
def lane_forced(monkeypatch):
    """Force the per-lane walk for any triangle count, Pallas off."""
    monkeypatch.setattr(tracemod, "LANE_SWITCH_TRIS", 0)
    monkeypatch.setattr(OPTS, "pallas", "off")


@pytest.mark.slow
def test_lane_matches_oracle_tri_soup(lane_forced):
    scene = random_tri_soup_scene(n=60)
    cam = make_camera((0, 0, 2.0), (0, 0, -1), **CAM)
    img = render_frame(scene, cam, CFG)
    oimg, _ = render_oracle(scene, cam, CFG)
    assert np.array_equal(img, oimg)


def test_lane_matches_oracle_single_triangle(lane_forced):
    scene = single_triangle_scene()
    cam = make_camera((0, 0, 1.0), (0, 0, -2), **CAM)
    img = render_frame(scene, cam, CFG)
    oimg, _ = render_oracle(scene, cam, CFG)
    assert np.array_equal(img, oimg)


@pytest.mark.slow
def test_lane_traverse_equals_packet_on_random_rays():
    scene = random_tri_soup_scene(n=60)
    rng = np.random.default_rng(7)
    N = (4, 128)
    o = rng.normal(scale=0.5, size=(3,) + N).astype(np.float32)
    o[2] += 2.0
    d = rng.normal(size=(3,) + N).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    ro = V3(*(jnp.asarray(c) for c in o))
    rd = V3(*(jnp.asarray(c) for c in d))
    act = jnp.ones(N, bool)

    t, u, v, tri = tracemod.lane_traverse(scene, ro, rd, 1e-3, 1e9, act)
    import jax
    hit_pkt = jax.vmap(
        lambda ox, oy, oz, dx, dy, dz, a: tracemod.packet_traverse(
            scene, V3(ox, oy, oz), V3(dx, dy, dz), 1e-3, 1e9, a)
    )(ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, act)

    t_l = np.asarray(t)
    hit_l = np.asarray(tri) >= 0
    assert np.array_equal(hit_l, np.asarray(hit_pkt.hit))
    # same triangle accepted (tri is a tri_pack/leaf-order row on the
    # lane path vs an input-order index on the packet path — compare t)
    np.testing.assert_allclose(t_l[hit_l],
                               np.asarray(hit_pkt.t)[hit_l], rtol=0,
                               atol=0)
    np.testing.assert_array_equal(np.asarray(u)[hit_l],
                                  np.asarray(hit_pkt.u)[hit_l])
    np.testing.assert_array_equal(np.asarray(v)[hit_l],
                                  np.asarray(hit_pkt.v)[hit_l])


def test_lane_any_hit_blocks_like_closest():
    scene = random_tri_soup_scene(n=60)
    rng = np.random.default_rng(11)
    N = (2, 128)
    o = rng.normal(scale=0.5, size=(3,) + N).astype(np.float32)
    o[2] += 2.0
    d = rng.normal(size=(3,) + N).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    ro = V3(*(jnp.asarray(c) for c in o))
    rd = V3(*(jnp.asarray(c) for c in d))
    act = jnp.ones(N, bool)
    t_c, _, _, tri_c = tracemod.lane_traverse(scene, ro, rd, 1e-3, 1e9, act)
    t_a, _, _, tri_a = tracemod.lane_traverse(scene, ro, rd, 1e-3, 1e9, act,
                                              any_hit=True)
    # any-hit finds an occluder exactly when closest-hit does
    assert np.array_equal(np.asarray(tri_a) >= 0, np.asarray(tri_c) >= 0)
