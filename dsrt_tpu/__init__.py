"""dsrt_tpu — Deep-Space Ray Tracer, TPU-native.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the CUDA
reference `Ofredy/Deep-Space-Ray-Tracer`: a physically based path tracer
(Shirley-series materials, MIS sun light, triangle meshes + BVH), a
double-precision deep-space frame pipeline, a SPICE/Kepler lunar-orbit pose
generator, and post-processing tools.

Architecture (TPU-first, not a port):

- The CUDA megakernel (reference src/gpu_render.cu:973-1031) becomes a
  *packet wavefront* tracer: rays are grouped into fixed-size packets that
  traverse the BVH with one shared stack per packet — scalar control flow,
  vector intersection tests — so node fetches are small per-packet gathers
  instead of per-ray gathers (see `dsrt_tpu.ops.trace`).
- Scene compilation (OBJ/MTL parse, material inference, texture atlas, BVH
  build — reference src/gpu_scene_builder.cpp) runs ONCE per scene on the
  host (NumPy, with an optional native C++ builder), instead of once per
  frame as in the reference (src/main.cpp:404-410).
- The double-precision world→model transform (reference src/main.cpp:306-385)
  stays in host float64; the TPU only ever sees model-frame float32.
- Multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` with ICI
  collectives (`psum` over a samples axis, pixel-sharding over a data axis)
  instead of any NCCL/MPI analogue (`dsrt_tpu.parallel`).

Per-pixel RNG is the reference's exact LCG (inc/rtweekend.h:126-133), so a
single-chip or pixel-sharded render is sample-stream-identical to the CUDA
renderer.
"""

__version__ = "0.1.0"

from dsrt_tpu.config import RenderConfig, SunConfig  # noqa: F401


def __getattr__(name):
    """Lazy convenience exports (avoid importing jax at package import)."""
    lazy = {
        "render_frame": ("dsrt_tpu.render", "render_frame"),
        "render_frame_wavefront": ("dsrt_tpu.render", "render_frame_wavefront"),
        "make_camera": ("dsrt_tpu.ops.camera", "make_camera"),
        "point_camera_at": ("dsrt_tpu.ops.camera", "point_camera_at"),
        "SceneBuilder": ("dsrt_tpu.models.scene", "SceneBuilder"),
        "Material": ("dsrt_tpu.models.materials", "Material"),
        "load_obj": ("dsrt_tpu.models.obj", "load_obj"),
    }
    if name in lazy:
        import importlib
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
