"""Packed VMEM table mode (8 records per 128-lane row): force it on a tiny
scene by shrinking the dense budget, and require oracle-exact results —
covers the mask-reduce scalar extraction path without a 50k-tri compile."""

import numpy as np
import pytest

import dsrt_tpu.ops.pallas_trace as PT
from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.presets import random_tri_soup_scene
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.oracle import render_oracle
from dsrt_tpu.render import render_radiance

W, H = 20, 12
CFG = RenderConfig(width=W, height=H, spp=2, max_depth=8)


@pytest.fixture
def force_packed(monkeypatch):
    if not PT.backend_is_tpu():
        pytest.skip("packed mode is a Pallas/TPU path")
    monkeypatch.setattr(PT, "_VMEM_BUDGET_ROWS", 1)
    # fits_vmem -> False (packed selected); fits_vmem_packed must still pass
    monkeypatch.setattr(PT, "fits_vmem_packed", lambda scene: True)


def test_packed_matches_oracle(force_packed):
    scene = random_tri_soup_scene(n=61)  # unique n_tris => fresh jit under the patched budget
    assert not PT.fits_vmem(scene)  # budget shrunk -> packed path
    cam = make_camera((0, 0, 2.0), (0, 0, -3), vfov=55, width=W, height=H)
    fl = render_radiance(scene, cam, CFG)
    _, ofl = render_oracle(scene, cam, CFG)
    assert np.abs(fl - ofl).max() <= 5e-5
