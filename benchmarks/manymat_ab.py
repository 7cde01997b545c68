#!/usr/bin/env python
"""A/B the walk-end material resolve at small vs MTL-heavy table sizes
(VERDICT r4 item 9 'Done' criteria): n_mats=8 must be flat vs the old
unrolled chain (it IS the old chain — the MXU gather only engages past
32 rows), and n_mats=200 must not serialize.

Builds the textured ISS stand-in, then splinters its panel material
into N distinct lambertian rows round-robin across the mesh's panel
triangles — same geometry, same BVH, same texture, only the material
TABLE (and per-tri material ids) changes, so the throughput delta
isolates the resolve.

Run: python benchmarks/manymat_ab.py
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dsrt_tpu.config import RenderConfig  # noqa: E402
from dsrt_tpu.models.materials import Material  # noqa: E402
from dsrt_tpu.models.mesh_gen import iss_standin_mesh  # noqa: E402
from dsrt_tpu.models.scene import SceneBuilder  # noqa: E402
from dsrt_tpu.ops.camera import point_camera_at  # noqa: E402
import bench  # noqa: E402


def build(n_extra_mats: int, tex_path: str):
    mesh = iss_standin_mesh(12, tex_path=tex_path)
    if n_extra_mats:
        # splinter: give untextured tris one of n distinct albedos.
        # Material rows upsert by INSTANCE, so build the n materials
        # once and round-robin the same objects.
        pool = [Material.lambertian(
            (0.2 + 0.6 * (i / n_extra_mats),
             0.7 - 0.4 * (i / n_extra_mats),
             0.3 + 0.1 * (i / n_extra_mats)))
            for i in range(n_extra_mats)]
        mats = list(mesh.materials)
        k = 0
        for i, tp in enumerate(mesh.tex_paths):
            if tp:
                continue
            mats[i] = pool[k % n_extra_mats]
            k += 1
        mesh = _with_mats(mesh, mats)
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.35, 0.65, 0.4),
                     sun_radiance=(1e5, 9.5e4, 9e4), seed=1337,
                     bvh_method="sbvh")
    b.add_mesh(mesh)
    return b.build()


def _with_mats(mesh, mats):
    import dataclasses
    return dataclasses.replace(mesh, materials=mats)


def main():
    cfg = RenderConfig(width=800, height=450, spp=32, max_depth=50)
    cam = point_camera_at((40.0, 60.0, 190.0), (0.0, 0.0, 0.0),
                          vfov=cfg.vfov, width=800, height=450)
    with tempfile.TemporaryDirectory() as td:
        tex_path = os.path.join(td, "panel.png")
        bench._write_panel_texture(tex_path)
        for n in (0, 28, 200):
            scene = build(n, tex_path)
            n_mats = int(scene.mat_pack.shape[0])
            mode = "unroll" if n_mats <= 32 else "mxu-gather"
            mrays, dt, exact = bench._fused_mrays(scene, cam, cfg)
            print(f"n_mats={n_mats:4d} ({mode:10s}): "
                  f"{mrays:6.2f} Mrays/s ({dt*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
