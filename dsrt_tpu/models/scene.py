"""Scene schema (device SoA pytree) and the host scene compiler.

TPU-native equivalent of inc/gpu_scene.h (POD schema) +
src/gpu_scene_builder.cpp (flattener): the scene graph is compiled ONCE on
the host into structure-of-arrays jnp buffers, then reused for every frame
(the reference rebuilds and re-uploads everything per frame,
src/main.cpp:404-410 — SURVEY.md §3B flags this as waste to fix).

Array-count metadata lives in pytree aux (static under jit), so one
compiled render executable serves all frames of a scene.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dsrt_tpu.models.materials import (DIFFUSE_LIGHT, Material,
                                       DEFAULT_MATERIAL)
from dsrt_tpu.models.bvh_build import (BVH, build_bvh, collapse_wide,
                                       lane_pack_wide)
from dsrt_tpu.models.textures import TextureRegistry, make_perlin_tables

# Medium boundary kinds
MED_SPHERE = 0
MED_BOX = 1


def _pack_for_kernel(bvh: BVH, v0: np.ndarray, v1: np.ndarray,
                     v2: np.ndarray, tri_mat: np.ndarray, fn: np.ndarray):
    """Build the Pallas traversal tables.

    bvh_pack f32[Bp,16] per node: [minx,miny,minz,maxx,maxy,maxz, skip,
    leaf_off, leaf_cnt, 0...].  `skip` is the stackless threaded-BVH escape
    index: with preorder layout (left child == parent+1), skip = node +
    subtree_size, so traversal is `node+1` on descend and `skip` on
    miss/leaf — no stack.  Integer fields are stored as exact small floats.

    tri_pack f32[Tp,16] per triangle (in leaf order): [v0(3), e1(3), e2(3),
    mat_id, fn(3), uvp(3)] with e = precomputed Moller-Trumbore edges,
    mat_id the material row (exact small float), fn the stored flat face
    normal (so the fused path kernel shades with bit-identical normals),
    and uvp the per-vertex texture UVs as packed bf16 pairs (lane 13 =
    [u0:v0] bits, 14 = [u1:v1], 15 = [u2:v2]) — bit patterns, extract
    with bitcasts, never float arithmetic.  Rows padded to a multiple
    of 8 (sublane tile); padded triangles are degenerate (det 0).

    thr_pack f32[Bp,16] per node: the *octant thread table* for front-to-
    back (ordered) descent — lanes [2o, 2o+1] hold (enter, skip) for ray-
    direction octant o = (dx<0) + 2(dy<0) + 4(dz<0).  `enter` is the child
    nearer along the octant's representative direction (sign of
    (center_R - center_L)·ŝ); `skip` is the next node in that octant's
    DFS preorder after this node's subtree.  Visiting near children first
    lets a leaf hit shrink `closest` before far subtrees are slab-tested,
    restoring the early-out the canonical skip-pointer layout loses
    (the per-ray ordering of src/gpu_render.cu:433-454, done per packet).
    """
    b = bvh.num_nodes
    size = np.ones(b, np.int64)
    internal = (bvh.tri_count == 0) & (bvh.left >= 0)
    for i in range(b - 1, -1, -1):
        if internal[i]:
            size[i] = 1 + size[bvh.left[i]] + size[bvh.right[i]]
    skip = np.arange(b) + size

    bp = max(((b + 7) // 8) * 8, 8)
    pack = np.zeros((bp, 16), np.float32)
    pack[:b, 0:3] = bvh.bbox_min
    pack[:b, 3:6] = bvh.bbox_max
    pack[:b, 6] = skip.astype(np.float32)
    pack[:b, 7] = bvh.tri_offset.astype(np.float32)
    pack[:b, 8] = bvh.tri_count.astype(np.float32)
    pack[b:, 6] = float(b)  # padded rows escape immediately (never visited)

    # ---- octant thread table ------------------------------------------
    end = b
    enter_t = np.full((8, b), end, np.int64)
    skip_t = np.full((8, b), end, np.int64)
    if b and internal.any():
        li, ri = bvh.left, bvh.right
        cl = 0.5 * (bvh.bbox_min[np.maximum(li, 0)]
                    + bvh.bbox_max[np.maximum(li, 0)])
        cr = 0.5 * (bvh.bbox_min[np.maximum(ri, 0)]
                    + bvh.bbox_max[np.maximum(ri, 0)])
        # representative direction per octant: ŝ = (±1, ±1, ±1)
        s = np.array([[1.0 - 2.0 * ((o >> a) & 1) for a in range(3)]
                      for o in range(8)], np.float32)        # (8,3)
        left_first = ((cr - cl) @ s.T) >= 0.0                # (b,8)
        octs = np.arange(8)
        # canonical preorder (node index order) guarantees parents are
        # threaded before their children
        for n in range(b):
            if not internal[n]:
                continue
            near = np.where(left_first[n], li[n], ri[n])
            far = np.where(left_first[n], ri[n], li[n])
            enter_t[octs, n] = near
            skip_t[octs, near] = far
            skip_t[octs, far] = skip_t[octs, n]
    thr = np.zeros((bp, 16), np.float32)
    thr[:, 0::2] = float(end)
    thr[:, 1::2] = float(end)
    if b:
        thr[:b, 0::2] = enter_t.T.astype(np.float32)
        thr[:b, 1::2] = skip_t.T.astype(np.float32)

    t = len(v0)
    tp = max(((t + 7) // 8) * 8, 8)
    tpack = np.zeros((tp, 16), np.float32)
    if t:
        tpack[:t, 0:3] = v0
        tpack[:t, 3:6] = v1 - v0
        tpack[:t, 6:9] = v2 - v0
        tpack[:t, 9] = tri_mat.astype(np.float32)
        tpack[:t, 10:13] = fn
    return pack, tpack, thr


def _bf16_round(a: np.ndarray) -> np.ndarray:
    """Round f32 to the nearest bf16 (ties to even), returned as f32
    with zero low mantissa bits — the value the fused kernel's packed
    uv lanes reproduce exactly via bitmask extraction."""
    bits = np.ascontiguousarray(a, np.float32).view(np.uint32)
    rounded = ((bits + np.uint32(0x7FFF) + ((bits >> np.uint32(16))
                                            & np.uint32(1)))
               & np.uint32(0xFFFF0000)).astype(np.uint32)
    # NaN payloads don't matter for uv data; keep it simple
    return rounded.view(np.float32).reshape(a.shape)


def _pack_uv_bf16(uv: np.ndarray) -> np.ndarray:
    """(N,2) bf16-rounded f32 uv -> (N,) f32 whose bits are
    [u_bf16 : v_bf16] (u in the high 16).  The kernel unpacks with
    (bits & 0xffff0000) and (bits << 16) bitcasts — exact."""
    ub = np.ascontiguousarray(uv[:, 0], np.float32).view(np.uint32)
    vb = np.ascontiguousarray(uv[:, 1], np.float32).view(np.uint32)
    return ((ub & np.uint32(0xFFFF0000)) | (vb >> 16)).view(np.float32)


def _pack8(rows16: np.ndarray) -> np.ndarray:
    """(N,16) row table -> (ceil(N/8),128): record j of row r occupies
    lanes [16j,16j+16) — 8 records per VMEM row (64 B/record)."""
    n = rows16.shape[0]
    n8 = ((n + 7) // 8) * 8
    padded = np.zeros((n8, 16), rows16.dtype)
    padded[:n] = rows16
    return padded.reshape(n8 // 8, 128)


def _tile_pack(rows16: np.ndarray) -> np.ndarray:
    """Tile-packed layout for the fused kernel's vectorized leaf engine:
    64 records per (8,128) group — out[8G + r, 16j + c] = record
    (64G + 8j + r)'s field c.  One vector load + lane roll then yields a
    whole 8-record tile as an (8,16) block whose field c is the (8,1)
    COLUMN W[:, c:c+1] (record r at sublane r) — ready for broadcast
    math against (1,128) ray rows, the same shape trick as the wide-BVH
    child records (bvh_build.lane_pack_wide).  Padding records are zero
    (Moller-Trumbore det == 0 -> rejected)."""
    n = rows16.shape[0]
    n64 = ((n + 63) // 64) * 64
    padded = np.zeros((n64, 16), rows16.dtype)
    padded[:n] = rows16
    # (G, j, r, c) -> (G, r, j, c)
    arr = padded.reshape(n64 // 64, 8, 8, 16).transpose(0, 2, 1, 3)
    return arr.reshape((n64 // 64) * 8, 128)


def _f32(a):
    return jnp.asarray(np.asarray(a, np.float32))


def _i32(a):
    return jnp.asarray(np.asarray(a, np.int32))


@partial(jax.tree_util.register_dataclass,
         data_fields=[
             "tri_v0", "tri_v1", "tri_v2", "tri_n0", "tri_n1", "tri_n2",
             "tri_uv0", "tri_uv1", "tri_uv2", "tri_mat", "tri_tex",
             "bvh_min", "bvh_max", "bvh_left", "bvh_right",
             "bvh_tri_offset", "bvh_tri_count", "tri_indices",
             "bvh_pack", "tri_pack", "bvh_pk8", "tri_pk8", "bvh_wide",
             "thr_pack", "thr_pk8", "tri_aux", "tri_aux_pk8",
             "tri_tile", "tri_aux_tile",
             "tri_shade", "mat_pack",
             "sph_center", "sph_center2", "sph_radius", "sph_mat",
             "quad_q", "quad_u", "quad_v", "quad_n", "quad_w", "quad_d",
             "quad_area", "quad_mat",
             "light_idx", "light_kind",
             "mat_type", "mat_albedo", "mat_emissive", "mat_fuzz",
             "mat_ref_idx", "mat_ptex_kind", "mat_ptex_scale",
             "mat_ptex_color2",
             "tex_pool", "tex_w", "tex_h", "tex_off",
             "tex_pool_tiled", "tex_toff", "tex_ttw",
             "perlin_vec", "perlin_px", "perlin_py", "perlin_pz",
             "med_kind", "med_center", "med_radius", "med_min", "med_max",
             "med_neg_inv_density", "med_albedo",
             "sun_dir", "sun_radiance",
         ],
         meta_fields=[
             "n_tris", "n_spheres", "n_quads", "n_nodes", "n_lights",
             "n_media",
             "max_leaf", "n_textures", "sun_enabled", "has_image_tex",
             "has_ptex", "has_smooth", "has_moving", "seed",
             "wide_max_span", "env_tex", "env_rotation", "env_scale",
             "tex_bf16",
         ])
@dataclasses.dataclass(frozen=True)
class Scene:
    """Flattened device scene.  Fields mirror GPUScene
    (inc/gpu_scene.h:116-173) reorganized as SoA columns."""

    # triangles (AoS GPUTriangle inc/gpu_scene.h:57-72 -> columns)
    tri_v0: jnp.ndarray
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    tri_n0: jnp.ndarray
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_mat: jnp.ndarray
    tri_tex: jnp.ndarray
    # BVH (inc/gpu_scene.h:77-85)
    bvh_min: jnp.ndarray
    bvh_max: jnp.ndarray
    bvh_left: jnp.ndarray
    bvh_right: jnp.ndarray
    bvh_tri_offset: jnp.ndarray
    bvh_tri_count: jnp.ndarray
    tri_indices: jnp.ndarray
    # packed VMEM tables for the Pallas traversal kernel (ops/pallas_trace):
    # bvh_pack f32[Bp,16]: min(3) max(3) skip off cnt pad...; skip-pointer
    # (stackless threaded) preorder layout; tri_pack f32[Tp,16]:
    # v0(3) e1(3) e2(3) pad..., triangles in BVH-leaf order.
    bvh_pack: jnp.ndarray
    tri_pack: jnp.ndarray
    # octant thread table (ordered descent): f32[Bp,16], lanes [2o, 2o+1]
    # = (enter, skip) pointers for direction octant o (see _pack_for_kernel)
    thr_pack: jnp.ndarray
    thr_pk8: jnp.ndarray
    # fused-kernel aux per-triangle shading table, row-aligned with
    # tri_pack: [n0(3), n1(3), n2(3), uv0(2), uv1(2), uv2(2), tex] = 16
    # fields exactly — the smooth-normal / image-texture data the 13-field
    # MT record has no room for.  tri_aux_pk8 is the 8-records-per-row
    # lane-packed variant (same convention as tri_pk8).
    tri_aux: jnp.ndarray
    tri_aux_pk8: jnp.ndarray
    # tile-packed (64 records / (8,128) group) variants for the fused
    # kernel's vectorized leaf engine (see _tile_pack)
    tri_tile: jnp.ndarray
    tri_aux_tile: jnp.ndarray
    # consolidated shading tables: one row-gather per wave instead of many
    # column gathers (TPU gathers are op-overhead-bound).
    # tri_shade f32[T,16]: n(3) uv0(2) uv1(2) uv2(2) mat tex pad...
    # mat_pack f32[M,16]: type albedo(3) emissive(3) fuzz ref_idx
    #                     ptex_kind ptex_scale ptex_color2(3) tex pad
    #   (col 14 `tex` = image-texture id, a pure function of the
    #    material row — upsert() keys entries on (material, texture))
    tri_shade: jnp.ndarray
    mat_pack: jnp.ndarray
    # dense-packed variants (8 records per 128-lane row) for scenes whose
    # row tables exceed the ~16 MB VMEM ceiling: 64 B/record instead of
    # 512 B (see ops/pallas_trace.py packed mode).
    bvh_pk8: jnp.ndarray
    tri_pk8: jnp.ndarray
    # 8-ary wide-BVH table for the fused megakernel's stack traversal:
    # lane-packed f32[8*ceil(Nw/8),128], 8 nodes per (8,128) VMEM tile
    # (see bvh_build.WideBVH / lane_pack_wide)
    bvh_wide: jnp.ndarray
    # spheres (inc/gpu_scene.h:50-55); center2 = center at time 1 for
    # moving spheres (center-as-ray, inc/sphere.h:143-146: center(t) =
    # c0 + t*(c2-c0)); static spheres store center2 == center
    sph_center: jnp.ndarray
    sph_center2: jnp.ndarray
    sph_radius: jnp.ndarray
    sph_mat: jnp.ndarray
    # quads (the reference's vestigial inc/qaud.h:31-123 resurrected):
    # plane corner Q + edge vectors u, v; n = unit normal, d = n.Q,
    # w = cross(u,v)/|cross(u,v)|^2 (interior test), area = |cross(u,v)|
    quad_q: jnp.ndarray
    quad_u: jnp.ndarray
    quad_v: jnp.ndarray
    quad_n: jnp.ndarray
    quad_w: jnp.ndarray
    quad_d: jnp.ndarray
    quad_area: jnp.ndarray
    quad_mat: jnp.ndarray
    # area lights for the mixture pdf: kind 0 = sphere, 1 = quad
    # (spheres first, quads after — inc/qaud.h:74-88 pdf_value/random)
    light_idx: jnp.ndarray
    light_kind: jnp.ndarray
    # materials (inc/gpu_scene.h:34-45)
    mat_type: jnp.ndarray
    mat_albedo: jnp.ndarray
    mat_emissive: jnp.ndarray
    mat_fuzz: jnp.ndarray
    mat_ref_idx: jnp.ndarray
    mat_ptex_kind: jnp.ndarray
    mat_ptex_scale: jnp.ndarray
    mat_ptex_color2: jnp.ndarray
    # textures (inc/gpu_scene.h:28-32 + pool)
    tex_pool: jnp.ndarray
    tex_w: jnp.ndarray
    tex_h: jnp.ndarray
    tex_off: jnp.ndarray
    # 32x32-texel tiled relayout of tex_pool (fused-kernel gather
    # locality; same values, tiled addresses — textures.build_pool_tiled)
    tex_pool_tiled: jnp.ndarray
    tex_toff: jnp.ndarray
    tex_ttw: jnp.ndarray
    # Perlin tables (inc/perlin.h:18-37)
    perlin_vec: jnp.ndarray
    perlin_px: jnp.ndarray
    perlin_py: jnp.ndarray
    perlin_pz: jnp.ndarray
    # participating media (inc/constant_medium.h resurrected)
    med_kind: jnp.ndarray
    med_center: jnp.ndarray
    med_radius: jnp.ndarray
    med_min: jnp.ndarray
    med_max: jnp.ndarray
    med_neg_inv_density: jnp.ndarray
    med_albedo: jnp.ndarray
    # directional sun (inc/gpu_scene.h:169-172)
    sun_dir: jnp.ndarray
    sun_radiance: jnp.ndarray

    # ---- static metadata (pytree aux; jit specializes on these) ----
    n_tris: int
    n_spheres: int
    n_quads: int
    n_nodes: int
    n_lights: int
    n_media: int
    max_leaf: int
    n_textures: int
    sun_enabled: bool
    has_image_tex: bool
    has_ptex: bool
    # per-vertex (vn) shading normals present: smooth shading runs on the
    # interpolating XLA path (the Pallas kernels shade with flat normals)
    has_smooth: bool
    # any moving sphere present (center2 != center somewhere)
    has_moving: bool
    seed: int
    # max triangles spanned by ONE wide node's contiguous leaf block
    # ([min ptr, max end) over its leaf children) — sizes the fused
    # kernel's HBM-streamed leaf window (exec_opts.hbm_tris)
    wide_max_span: int = 64
    # environment-map sky (SKY_ENV_MAP productized, inc/gpu_scene.h:93):
    # texture-pool index of the equirect env map (-1 = reference-parity
    # black background), rotation in radians (the env_rotation knob the
    # reference plumbs but never reads, gpu_scene.h:108), radiance scale
    env_tex: int = -1
    env_rotation: float = 0.0
    env_scale: float = 1.0
    # texture pools hold bf16-representable values (build-time source
    # quantization; lets the fused gather matmul run in bf16)
    tex_bf16: bool = False

    @property
    def has_env(self) -> bool:
        return self.env_tex >= 0


@dataclasses.dataclass
class _MeshEntry:
    v0: np.ndarray
    v1: np.ndarray
    v2: np.ndarray
    uv0: np.ndarray
    uv1: np.ndarray
    uv2: np.ndarray
    materials: List[Material]       # per-triangle material object
    tex_paths: List[str]            # per-triangle map_Kd path ("" if none)
    # optional per-vertex shading normals (smooth opt-in); None = flat
    n0: Optional[np.ndarray] = None
    n1: Optional[np.ndarray] = None
    n2: Optional[np.ndarray] = None


class SceneBuilder:
    """Host scene compiler: collects primitives, dedups materials by object
    identity (the raw-pointer key of src/gpu_scene_builder.cpp:88), builds
    texture pool + BVH, and emits a `Scene`."""

    def __init__(self, sun_enabled: bool = True,
                 sun_dir: Tuple[float, float, float] = (0.0, 1.0, 0.0),
                 sun_radiance: Tuple[float, float, float] = (1e5, 9.5e4, 9e4),
                 seed: int = 1337,
                 bvh_method: str = "median",
                 wide_max_leaf: Optional[int] = None,
                 sbvh_alpha: float = 1e-5,
                 tex_bf16: bool = True):
        self._meshes: List[_MeshEntry] = []
        self._spheres: List[tuple] = []
        self._quads: List[tuple] = []
        self._media: List[tuple] = []
        self.sun_enabled = sun_enabled
        self.sun_dir = np.asarray(sun_dir, np.float64)
        self.sun_radiance = np.asarray(sun_radiance, np.float32)
        self.seed = seed
        self.bvh_method = bvh_method
        # SBVH spatial-split gate (overlap SA fraction of root that
        # triggers a split attempt; 0 = always try).  At ISS scale
        # alpha 0 raises refs 1.07x -> 1.55x — sweepable because the
        # fused kernel is SPINE-LATENCY-bound (r4 dup attribution:
        # 2x ANY vector segment is free), so trading leaf refs for
        # fewer node visits can pay.
        self.sbvh_alpha = sbvh_alpha
        # Source-quantize texture pools to bf16-representable floats:
        # every sampler (oracle / split / fused) then reads identical
        # values, and the fused kernel's one-hot gather matmuls run at
        # the MXU's native bf16 rate (~6x the f32-HIGHEST 6-pass form)
        # on half the VMEM.  8-bit-sourced textures keep ~all their
        # information through the bf16 mantissa (the uvrec bf16-UV
        # precedent); HDR env maps lose <0.4% relative.  Set False for
        # f32-exact texels (reference parity at float precision).
        self.tex_bf16 = tex_bf16
        # 8-ary collapse leaf bound (box-test-count vs tri-test-count
        # knob; identical intersection semantics for any value).
        # None = size-dependent auto: 16 for small scenes, 20 at
        # >= 16k tri references — the wml sweep at the r4 engine
        # balance (SBVH + half-split + pops4) peaks at 20 for ISS
        # scale (textured 43.2 -> 47.5, untextured 58.1 -> 61.7
        # Mrays/s, node visits -24%) while the 5.8k scene still
        # prefers 16 (95.1 vs 92.5).
        self.wide_max_leaf = wide_max_leaf
        self._perlin_seed: Optional[int] = None
        self._env: Optional[tuple] = None   # (path_or_array, rot, scale)

    def set_environment(self, image, rotation_deg: float = 0.0,
                        scale: float = 1.0) -> None:
        """Equirectangular environment-map sky (extension: productizes the
        reference's dead SKY_ENV_MAP value + unread env_rotation knob,
        inc/gpu_scene.h:90-108).  `image` is a file path (.hdr stays
        linear radiance; LDR formats get the pool's sRGB->linear) or an
        (H,W,3) float linear array.  Miss rays then pick up
        scale * env(dir) instead of the reference's black background."""
        self._env = (image, float(np.radians(rotation_deg)), float(scale))

    # ------------------------------------------------------------- add
    def add_sphere(self, center, radius: float, material: Material,
                   center2=None) -> None:
        """Static sphere, or moving when `center2` is given: the center
        travels c(t) = center + t*(center2 - center) over ray time t
        (the reference's center-as-ray, inc/sphere.h:143-146 — CPU-library
        only there; here it renders when cfg.time1 > cfg.time0)."""
        c = np.asarray(center, np.float32)
        c2 = c if center2 is None else np.asarray(center2, np.float32)
        self._spheres.append((c, float(radius), material, c2))

    def add_triangle(self, v0, v1, v2, material: Material,
                     uv0=(0, 0), uv1=(0, 0), uv2=(0, 0),
                     tex_path: str = "") -> None:
        self._meshes.append(_MeshEntry(
            np.asarray([v0], np.float32), np.asarray([v1], np.float32),
            np.asarray([v2], np.float32),
            np.asarray([uv0], np.float32), np.asarray([uv1], np.float32),
            np.asarray([uv2], np.float32), [material], [tex_path]))

    def add_mesh(self, mesh, translate=None, rotate_y_deg: float = 0.0,
                 flip_face: bool = False) -> None:
        """Add a loaded mesh (models.obj.MeshData or _MeshEntry-compatible).

        The reference's instancing wrappers (inc/hittable.h:61-233) become
        build-time transforms — the TPU-native equivalent, since geometry
        is flattened to device arrays anyway:
        - rotate_y_deg: rotation about +Y, the wrapper's object-space map
          x' = cos t x + sin t z, z' = -sin t x + cos t z (hittable.h:99-102)
        - translate: vertex offset (hittable.h:35-57)
        - flip_face: reverses triangle winding, flipping the geometric
          normal (hittable.h:61-88)
        Applied rotate-then-translate, like nesting translate(rotate_y(o)).
        """
        v0, v1, v2 = mesh.v0, mesh.v1, mesh.v2
        n0 = getattr(mesh, "n0", None)
        n1 = getattr(mesh, "n1", None)
        n2 = getattr(mesh, "n2", None)
        if rotate_y_deg:
            t = np.deg2rad(float(rotate_y_deg))
            c, s = np.cos(t), np.sin(t)
            R = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]],
                         np.float64)
            v0 = (v0.astype(np.float64) @ R.T).astype(np.float32)
            v1 = (v1.astype(np.float64) @ R.T).astype(np.float32)
            v2 = (v2.astype(np.float64) @ R.T).astype(np.float32)
            if n0 is not None:
                n0 = (n0.astype(np.float64) @ R.T).astype(np.float32)
                n1 = (n1.astype(np.float64) @ R.T).astype(np.float32)
                n2 = (n2.astype(np.float64) @ R.T).astype(np.float32)
        if translate is not None:
            off = np.asarray(translate, np.float32)
            v0 = v0 + off
            v1 = v1 + off
            v2 = v2 + off
        uv0, uv1, uv2 = mesh.uv0, mesh.uv1, mesh.uv2
        if flip_face:
            v1, v2 = v2, v1
            uv1, uv2 = uv2, uv1
            if n0 is not None:
                n0, n1, n2 = -n0, -n2, -n1
        self._meshes.append(_MeshEntry(
            v0, v1, v2, uv0, uv1, uv2,
            list(mesh.materials), list(mesh.tex_paths), n0=n0, n1=n1,
            n2=n2))

    def add_quad(self, q, u, v, material: Material,
                 flip_face: bool = False) -> None:
        """Planar quad: corner Q + edge vectors u, v (inc/qaud.h:9-20).
        flip_face swaps the edges, negating the geometric normal
        (inc/hittable.h:61-88 semantics at build time)."""
        if flip_face:
            u, v = v, u
        self._quads.append((np.asarray(q, np.float32),
                            np.asarray(u, np.float32),
                            np.asarray(v, np.float32), material))

    def add_box(self, a, b, material: Material) -> None:
        """Axis-aligned box as 6 quads, the reference's box() builder
        verbatim (inc/qaud.h:101-123)."""
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        mn = np.minimum(a, b)
        mx = np.maximum(a, b)
        dx = np.array([mx[0] - mn[0], 0, 0])
        dy = np.array([0, mx[1] - mn[1], 0])
        dz = np.array([0, 0, mx[2] - mn[2]])
        self.add_quad((mn[0], mn[1], mx[2]), dx, dy, material)   # front
        self.add_quad((mx[0], mn[1], mx[2]), -dz, dy, material)  # right
        self.add_quad((mx[0], mn[1], mn[2]), -dx, dy, material)  # back
        self.add_quad((mn[0], mn[1], mn[2]), dz, dy, material)   # left
        self.add_quad((mn[0], mx[1], mx[2]), dx, -dz, material)  # top
        self.add_quad((mn[0], mn[1], mn[2]), dx, dz, material)   # bottom

    def add_constant_medium_sphere(self, center, radius: float,
                                   density: float, albedo) -> None:
        self._media.append((MED_SPHERE, np.asarray(center, np.float32),
                            float(radius), np.zeros(3, np.float32),
                            np.zeros(3, np.float32), float(density),
                            np.asarray(albedo, np.float32)))

    def add_constant_medium_box(self, box_min, box_max,
                                density: float, albedo) -> None:
        self._media.append((MED_BOX, np.zeros(3, np.float32), 0.0,
                            np.asarray(box_min, np.float32),
                            np.asarray(box_max, np.float32), float(density),
                            np.asarray(albedo, np.float32)))

    def set_sun(self, direction, radiance=None, enabled: bool = True) -> None:
        self.sun_dir = np.asarray(direction, np.float64)
        if radiance is not None:
            self.sun_radiance = np.asarray(radiance, np.float32)
        self.sun_enabled = enabled

    # ----------------------------------------------------------- build
    def build(self) -> Scene:
        texreg = TextureRegistry()
        mats: List[Material] = []
        mat_index = {}
        mat_tex: List[int] = []   # per-entry image-texture id (-1 = none)

        def upsert(m: Optional[Material], tex_id: int = -1) -> int:
            # None -> fresh default entry each time (builder.cpp:76-86).
            # Keyed on (material, texture): the image texture is a
            # property of the material ROW (reference: map_Kd belongs to
            # the MTL material), so one Material object used with two
            # different textures gets two entries — this makes tex a
            # pure function of the material id, which lets the fused
            # kernel drop its per-accept texture-id candidate plane
            # (ops/pallas_path.py tile engine).
            if m is None:
                mats.append(DEFAULT_MATERIAL)
                mat_tex.append(tex_id)
                return len(mats) - 1
            key = (id(m), tex_id)
            if key in mat_index:
                return mat_index[key]
            mats.append(m)
            mat_tex.append(tex_id)
            mat_index[key] = len(mats) - 1
            return mat_index[key]

        # --- triangles
        tv0, tv1, tv2, tuv0, tuv1, tuv2 = [], [], [], [], [], []
        tn0, tn1, tn2 = [], [], []
        tmat, ttex = [], []
        has_smooth = False
        zero3 = np.zeros(3, np.float32)
        textured_mat_ids = set()
        for mesh in self._meshes:
            mn0 = getattr(mesh, "n0", None)
            for i in range(len(mesh.v0)):
                path = mesh.tex_paths[i] if i < len(mesh.tex_paths) else ""
                tex_id = texreg.get_or_load(path)
                mid = upsert(mesh.materials[i], tex_id)
                if tex_id >= 0:
                    # textured triangles force the material albedo to white
                    # (src/gpu_scene_builder.cpp:274-278)
                    textured_mat_ids.add(mid)
                tv0.append(mesh.v0[i]); tv1.append(mesh.v1[i]); tv2.append(mesh.v2[i])
                tuv0.append(mesh.uv0[i][:2]); tuv1.append(mesh.uv1[i][:2])
                tuv2.append(mesh.uv2[i][:2])
                if mn0 is not None:
                    tn0.append(mesh.n0[i]); tn1.append(mesh.n1[i])
                    tn2.append(mesh.n2[i])
                    has_smooth = True
                else:
                    tn0.append(zero3); tn1.append(zero3); tn2.append(zero3)
                tmat.append(mid); ttex.append(tex_id)

        n_tris = len(tv0)
        if n_tris:
            v0 = np.asarray(tv0, np.float32)
            v1 = np.asarray(tv1, np.float32)
            v2 = np.asarray(tv2, np.float32)
            # flat shading: face normal for all three corners
            # (inc/triangle.h:70-73)
            fn = np.cross(v1 - v0, v2 - v0)
            ln = np.linalg.norm(fn, axis=1, keepdims=True)
            fn = np.where(ln > 0, fn / np.maximum(ln, 1e-30), 0.0).astype(np.float32)
            uv0 = np.asarray(tuv0, np.float32)
            uv1 = np.asarray(tuv1, np.float32)
            uv2 = np.asarray(tuv2, np.float32)
            tri_tex_arr = np.asarray(ttex, np.int32)
            if textured_mat_ids:
                # Anchor-shift image-textured triangles' UVs by
                # floor(uv0): the sampler wraps to [0,1) via floor-frac
                # (src/gpu_render.cu:245-248) and interpolation is
                # affine with wb+u+v=1, so shifting all three corners by
                # one integer shifts the interpolated uv by exactly that
                # integer — the same texel after wrapping, but the
                # values now sit near [0,1) where quantization error is
                # bounded by the texture span instead of growing with
                # |uv| (tiled OBJ/MTL UVs reach tens).  Applied to the
                # SOURCE tables so oracle/split/fused all read the same
                # shifted values (cross-path bit-identity).
                anchor = np.floor(uv0) * (tri_tex_arr >= 0)[:, None]
                uv0 = uv0 - anchor
                uv1 = uv1 - anchor
                uv2 = uv2 - anchor
            if textured_mat_ids and not has_smooth:
                # Flat-textured scenes are quantized to bf16 AT BUILD
                # TIME (round to nearest even, stored back as f32 with
                # zero low mantissa bits): the fused kernel's in-record
                # engine carries them as bf16 pairs packed into the MT
                # record's 3 spare lanes (no aux tile loads), and every
                # path — oracle, split, fused — reads these same
                # quantized values, so cross-path bit-identity holds.
                # Error <= 2^-9 relative of the anchored uv (~1/512 of
                # the texture span); the reference samples at f32
                # (gpu_render.cu:763-774) — within the pixel-match
                # tolerance.  Smooth (vn) scenes never engage the
                # in-record engine (normals don't fit the record) and
                # keep full f32 UVs in their aux tiles.
                uv0 = _bf16_round(uv0)
                uv1 = _bf16_round(uv1)
                uv2 = _bf16_round(uv2)
            tri_mat = np.asarray(tmat, np.int32)
            tri_tex = np.asarray(ttex, np.int32)
            if has_smooth:
                # smooth opt-in: per-vertex vn where supplied, flat where a
                # corner had none (zero vector marks 'absent')
                sn0 = np.asarray(tn0, np.float32)
                sn1 = np.asarray(tn1, np.float32)
                sn2 = np.asarray(tn2, np.float32)
                miss = (np.linalg.norm(sn0, axis=1, keepdims=True) < 1e-6)
                vn0 = np.where(miss, fn, sn0).astype(np.float32)
                vn1 = np.where(
                    np.linalg.norm(sn1, axis=1, keepdims=True) < 1e-6,
                    fn, sn1).astype(np.float32)
                vn2 = np.where(
                    np.linalg.norm(sn2, axis=1, keepdims=True) < 1e-6,
                    fn, sn2).astype(np.float32)
            else:
                vn0 = vn1 = vn2 = fn
        else:
            v0 = v1 = v2 = fn = np.zeros((1, 3), np.float32)
            vn0 = vn1 = vn2 = fn
            uv0 = uv1 = uv2 = np.zeros((1, 2), np.float32)
            tri_mat = np.zeros(1, np.int32)
            tri_tex = -np.ones(1, np.int32)

        bvh: BVH = build_bvh(v0[:n_tris], v1[:n_tris], v2[:n_tris],
                             method=self.bvh_method,
                             sbvh_alpha=self.sbvh_alpha)
        if n_tris:
            # permute triangles into BVH-leaf order so leaves reference
            # contiguous rows; tri_indices becomes the identity (the
            # indirection of gpu_scene.h tri_indices, pre-applied)
            perm = bvh.tri_indices
            v0, v1, v2, fn = v0[perm], v1[perm], v2[perm], fn[perm]
            vn0, vn1, vn2 = vn0[perm], vn1[perm], vn2[perm]
            uv0, uv1, uv2 = uv0[perm], uv1[perm], uv2[perm]
            tri_mat, tri_tex = tri_mat[perm], tri_tex[perm]
            # SBVH emits a reference LIST (straddling tris duplicated
            # with clipped bounds): the triangle tables then carry one
            # row per REFERENCE and n_tris counts references
            n_tris = len(perm)
            tri_indices = np.arange(n_tris, dtype=np.int32)
        else:
            tri_indices = np.zeros(1, np.int32)
        # 8-ary collapse re-groups triangles by wide node (and rewrites
        # the binary leaves' offsets in place) -> apply its permutation
        # before any table is packed so both kernels share one tri order
        wml = (self.wide_max_leaf if self.wide_max_leaf is not None
               else (20 if n_tris >= 16384 else 16))
        wide = collapse_wide(bvh, wide_max_leaf=wml)
        if n_tris:
            src = wide.src
            v0, v1, v2, fn = v0[src], v1[src], v2[src], fn[src]
            vn0, vn1, vn2 = vn0[src], vn1[src], vn2[src]
            uv0, uv1, uv2 = uv0[src], uv1[src], uv2[src]
            tri_mat, tri_tex = tri_mat[src], tri_tex[src]
        bvh_pack, tri_pack, thr_pack = _pack_for_kernel(
            bvh, v0[:n_tris], v1[:n_tris], v2[:n_tris], tri_mat[:n_tris],
            fn[:n_tris])
        if n_tris:
            # spare lanes 13-15: per-vertex uv as packed bf16 pairs —
            # the fused kernel's flat-textured engine reads UVs straight
            # from the MT record (no aux tile loads; pallas_path
            # tile_update_row texrec branch)
            tri_pack[:n_tris, 13] = _pack_uv_bf16(uv0[:n_tris])
            tri_pack[:n_tris, 14] = _pack_uv_bf16(uv1[:n_tris])
            tri_pack[:n_tris, 15] = _pack_uv_bf16(uv2[:n_tris])
        bvh_pk8 = _pack8(bvh_pack)
        tri_pk8 = _pack8(tri_pack)
        thr_pk8 = _pack8(thr_pack)
        # dense sublane layout (8x lane padding, fastest loads) when the
        # whole fused working set fits VMEM; lane-packed (512 B/node,
        # one-roll extraction, ~4% slower) for big scenes.  The kernel
        # keys the load path off the static table shape.
        from dsrt_tpu.ops import pallas_trace as _pt
        if (wide.table.shape[0] + tri_pack.shape[0]
                <= _pt._VMEM_BUDGET_ROWS):
            bvh_wide = wide.table
        else:
            bvh_wide = lane_pack_wide(wide.table)
        # max contiguous tri span of one wide node's leaf children —
        # sizes the HBM-streamed leaf window (see Scene.wide_max_span)
        wt = wide.table.reshape(-1, 8, 16)
        leafm = wt[:, :, 7] > 0
        ends = np.where(leafm, wt[:, :, 6] + wt[:, :, 7], -1.0).max(1)
        begs = np.where(leafm, wt[:, :, 6], np.inf).min(1)
        spans = np.where(ends > 0, ends - begs, 0.0)
        wide_max_span = int(spans.max()) if spans.size else 64
        # aux fused-kernel table (row-aligned with tri_pack's 8-padding)
        tp_rows = tri_pack.shape[0]
        tri_aux = np.zeros((tp_rows, 16), np.float32)
        if n_tris:
            tri_aux[:n_tris, 0:3] = vn0[:n_tris]
            tri_aux[:n_tris, 3:6] = vn1[:n_tris]
            tri_aux[:n_tris, 6:9] = vn2[:n_tris]
            tri_aux[:n_tris, 9:11] = uv0[:n_tris]
            tri_aux[:n_tris, 11:13] = uv1[:n_tris]
            tri_aux[:n_tris, 13:15] = uv2[:n_tris]
            tri_aux[:n_tris, 15] = tri_tex[:n_tris].astype(np.float32)
            tri_aux[n_tris:, 15] = -1.0
        else:
            tri_aux[:, 15] = -1.0
        tri_aux_pk8 = _pack8(tri_aux)
        tri_tile = _tile_pack(tri_pack)
        tri_aux_tile = _tile_pack(tri_aux)
        tri_shade = np.zeros((max(n_tris, 1), 16), np.float32)
        tri_shade[:, 0:3] = fn[:max(n_tris, 1)]
        tri_shade[:, 3:5] = uv0[:max(n_tris, 1)]
        tri_shade[:, 5:7] = uv1[:max(n_tris, 1)]
        tri_shade[:, 7:9] = uv2[:max(n_tris, 1)]
        tri_shade[:, 9] = tri_mat[:max(n_tris, 1)].astype(np.float32)
        tri_shade[:, 10] = tri_tex[:max(n_tris, 1)].astype(np.float32)

        # --- spheres
        sc, sr, sm, sc2 = [], [], [], []
        for center, radius, m, c2 in self._spheres:
            sc.append(center); sr.append(radius); sm.append(upsert(m))
            sc2.append(c2)
        n_spheres = len(sc)
        if n_spheres == 0:
            sc = [np.array([1e30, 1e30, 1e30], np.float32)]
            sc2 = sc
            sr = [0.0]
            sm = [0]
        sph_center = np.asarray(sc, np.float32)
        sph_center2 = np.asarray(sc2, np.float32)
        sph_radius = np.asarray(sr, np.float32)
        sph_mat = np.asarray(sm, np.int32)
        has_moving = bool((sph_center2 != sph_center).any())

        # --- quads (inc/qaud.h:9-28 derived quantities, computed in f64
        # then demoted like the reference's double ctor)
        n_quads = len(self._quads)
        if n_quads:
            qq = np.asarray([q[0] for q in self._quads], np.float64)
            qu = np.asarray([q[1] for q in self._quads], np.float64)
            qv = np.asarray([q[2] for q in self._quads], np.float64)
            qm = np.asarray([upsert(q[3]) for q in self._quads], np.int32)
            cr = np.cross(qu, qv)
            n2 = (cr * cr).sum(axis=1, keepdims=True)
            n2 = np.maximum(n2, 1e-30)
            qn = cr / np.sqrt(n2)
            qw = cr / n2
            qd = (qn * qq).sum(axis=1)
            qarea = np.sqrt(n2[:, 0])
        else:
            qq = qu = qv = np.zeros((1, 3), np.float64)
            qn = np.array([[0.0, 0.0, 1.0]])
            qw = np.zeros((1, 3))
            qd = np.zeros(1)
            qarea = np.zeros(1)
            qm = np.zeros(1, np.int32)

        # --- media
        n_media = len(self._media)
        if n_media:
            med_kind = np.asarray([m[0] for m in self._media], np.int32)
            med_center = np.asarray([m[1] for m in self._media], np.float32)
            med_radius = np.asarray([m[2] for m in self._media], np.float32)
            med_min = np.asarray([m[3] for m in self._media], np.float32)
            med_max = np.asarray([m[4] for m in self._media], np.float32)
            med_nid = np.asarray([-1.0 / m[5] for m in self._media], np.float32)
            med_albedo = np.asarray([m[6] for m in self._media], np.float32)
        else:
            med_kind = np.zeros(1, np.int32)
            med_center = np.zeros((1, 3), np.float32)
            med_radius = np.zeros(1, np.float32)
            med_min = np.zeros((1, 3), np.float32)
            med_max = np.zeros((1, 3), np.float32)
            med_nid = np.zeros(1, np.float32)
            med_albedo = np.zeros((1, 3), np.float32)

        # --- materials table
        if not mats:
            mats.append(DEFAULT_MATERIAL)
            mat_tex.append(-1)
        n_mats = len(mats)
        mat_type = np.asarray([m.kind for m in mats], np.int32)
        mat_albedo = np.asarray([m.albedo for m in mats], np.float32)
        for mid in textured_mat_ids:
            mat_albedo[mid] = 1.0
        mat_emissive = np.asarray([m.emissive for m in mats], np.float32)
        mat_fuzz = np.asarray([m.fuzz for m in mats], np.float32)
        mat_ref_idx = np.asarray([m.ref_idx for m in mats], np.float32)
        mat_ptk = np.asarray([m.ptex_kind for m in mats], np.int32)
        mat_pts = np.asarray([m.ptex_scale for m in mats], np.float32)
        mat_ptc = np.asarray([m.ptex_color2 for m in mats], np.float32)
        mat_pack = np.zeros((n_mats, 16), np.float32)
        mat_pack[:, 0] = mat_type.astype(np.float32)
        mat_pack[:, 1:4] = mat_albedo
        mat_pack[:, 4:7] = mat_emissive
        mat_pack[:, 7] = mat_fuzz
        mat_pack[:, 8] = mat_ref_idx
        mat_pack[:, 9] = mat_ptk.astype(np.float32)
        mat_pack[:, 10] = mat_pts
        mat_pack[:, 11:14] = mat_ptc
        # col 14: image-texture id (-1 = none) — exact by construction
        # since upsert() keys entries on (material, texture), so the
        # fused kernel resolves the winning triangle's texture from its
        # material row instead of carrying a per-accept candidate plane
        mat_pack[:, 14] = np.asarray(mat_tex, np.float32)

        # --- emissive area lights, spheres then quads
        # (the per-bounce scan of src/gpu_render.cu:841-847, hoisted to
        # build time — the result is scene-constant; quad lights resurrect
        # the book's quad pdf_value/random, inc/qaud.h:74-88)
        lights = [(0, i) for i in range(n_spheres)
                  if mat_type[sph_mat[i]] == DIFFUSE_LIGHT
                  and mat_emissive[sph_mat[i]].max() > 0]
        lights += [(1, j) for j in range(n_quads)
                   if mat_type[qm[j]] == DIFFUSE_LIGHT
                   and mat_emissive[qm[j]].max() > 0]
        n_lights = len(lights)
        light_arr = np.asarray([l[1] for l in lights] if n_lights else [0],
                               np.int32)
        light_kind = np.asarray([l[0] for l in lights] if n_lights else [0],
                                np.int32)

        # --- environment map (registered after all triangle textures so
        # has_image_tex below can count TRIANGLE textures only)
        n_tex_tri = texreg.num_textures
        env_tex, env_rot, env_scale = -1, 0.0, 1.0
        if self._env is not None:
            img, env_rot, env_scale = self._env
            if isinstance(img, str):
                env_tex = texreg.get_or_load(img)
            else:
                env_tex = texreg.add_array(np.asarray(img, np.float32))

        # --- texture pool (+ the 32x32-tiled relayout for the fused
        # kernel's chunked gather — same texels, locality-friendly
        # addresses)
        pool, tex_w, tex_h, tex_off, n_tex = texreg.build_pool()
        pool_tiled, tex_toff, tex_ttw = texreg.build_pool_tiled()
        if self.tex_bf16:
            # source quantization: every sampler reads the SAME
            # bf16-representable values (see __init__ docstring)
            pool = _bf16_round(pool)
            pool_tiled = _bf16_round(pool_tiled)

        # --- perlin
        pv, px, py, pz = make_perlin_tables(
            np.random.default_rng(self._perlin_seed or 20271))

        sun_dir = self.sun_dir / max(np.linalg.norm(self.sun_dir), 1e-300)

        return Scene(
            tri_v0=_f32(v0), tri_v1=_f32(v1), tri_v2=_f32(v2),
            tri_n0=_f32(vn0), tri_n1=_f32(vn1), tri_n2=_f32(vn2),
            tri_uv0=_f32(uv0), tri_uv1=_f32(uv1), tri_uv2=_f32(uv2),
            tri_mat=_i32(tri_mat), tri_tex=_i32(tri_tex),
            bvh_min=_f32(bvh.bbox_min), bvh_max=_f32(bvh.bbox_max),
            bvh_left=_i32(bvh.left), bvh_right=_i32(bvh.right),
            bvh_tri_offset=_i32(bvh.tri_offset),
            bvh_tri_count=_i32(bvh.tri_count),
            tri_indices=_i32(tri_indices),
            bvh_pack=_f32(bvh_pack), tri_pack=_f32(tri_pack),
            bvh_pk8=_f32(bvh_pk8), tri_pk8=_f32(tri_pk8),
            bvh_wide=_f32(bvh_wide),
            thr_pack=_f32(thr_pack), thr_pk8=_f32(thr_pk8),
            tri_aux=_f32(tri_aux), tri_aux_pk8=_f32(tri_aux_pk8),
            tri_tile=_f32(tri_tile), tri_aux_tile=_f32(tri_aux_tile),
            tri_shade=_f32(tri_shade), mat_pack=_f32(mat_pack),
            sph_center=_f32(sph_center), sph_center2=_f32(sph_center2),
            sph_radius=_f32(sph_radius),
            sph_mat=_i32(sph_mat),
            quad_q=_f32(qq), quad_u=_f32(qu), quad_v=_f32(qv),
            quad_n=_f32(qn), quad_w=_f32(qw), quad_d=_f32(qd),
            quad_area=_f32(qarea), quad_mat=_i32(qm),
            light_idx=_i32(light_arr), light_kind=_i32(light_kind),
            mat_type=_i32(mat_type), mat_albedo=_f32(mat_albedo),
            mat_emissive=_f32(mat_emissive), mat_fuzz=_f32(mat_fuzz),
            mat_ref_idx=_f32(mat_ref_idx), mat_ptex_kind=_i32(mat_ptk),
            mat_ptex_scale=_f32(mat_pts), mat_ptex_color2=_f32(mat_ptc),
            tex_pool=_f32(pool), tex_w=_i32(tex_w), tex_h=_i32(tex_h),
            tex_off=_i32(tex_off),
            tex_pool_tiled=_f32(pool_tiled), tex_toff=_i32(tex_toff),
            tex_ttw=_i32(tex_ttw),
            perlin_vec=_f32(pv), perlin_px=_i32(px), perlin_py=_i32(py),
            perlin_pz=_i32(pz),
            med_kind=_i32(med_kind), med_center=_f32(med_center),
            med_radius=_f32(med_radius), med_min=_f32(med_min),
            med_max=_f32(med_max), med_neg_inv_density=_f32(med_nid),
            med_albedo=_f32(med_albedo),
            sun_dir=_f32(sun_dir), sun_radiance=_f32(self.sun_radiance),
            n_tris=n_tris, n_spheres=n_spheres, n_quads=n_quads,
            n_nodes=bvh.num_nodes,
            n_lights=n_lights, n_media=n_media,
            max_leaf=max(bvh.max_leaf_size, 1), n_textures=n_tex,
            sun_enabled=bool(self.sun_enabled),
            has_image_tex=bool(n_tex_tri > 0),
            has_ptex=bool((mat_ptk != 0).any()),
            has_smooth=bool(has_smooth),
            has_moving=has_moving,
            seed=int(self.seed),
            wide_max_span=max(wide_max_span, 1),
            env_tex=int(env_tex), env_rotation=float(env_rot),
            env_scale=float(env_scale), tex_bf16=bool(self.tex_bf16),
        )
