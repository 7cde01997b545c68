"""Brute-force NumPy reference tracer (the trusted oracle).

The reference left two latent correctness oracles unused: the brute-force
`scene_hit_bruteforce` (src/gpu_render.cu:553-577) and the debug shade path.
SURVEY.md §4 recommends productizing them; this module is that product: a
scalar, float32, line-by-line faithful implementation of the CUDA render
algorithm (src/gpu_render.cu:715-1031) used to generate golden images for
tiny scenes.  It shares NO code with the packet tracer — an independent
implementation of the same contract.

Intentionally slow (per-pixel Python loop).  Use images of a few hundred
pixels at single-digit spp in tests.
"""

from __future__ import annotations

import numpy as np

from dsrt_tpu.models.materials import DIELECTRIC, DIFFUSE_LIGHT, METAL

F = np.float32
PI = F(3.14159265358979323846)


class LCG:
    __slots__ = ("state",)

    def __init__(self, state: int):
        self.state = np.uint32(state)

    def rand(self) -> F:
        self.state = np.uint32((int(self.state) * 1664525 + 1013904223)
                               & 0xFFFFFFFF)
        return F(int(self.state) & 0xFFFFFF) * F(1.0 / 16777216.0)


def _norm(v):
    l2 = float(v @ v)
    if l2 <= 0.0:
        return np.zeros(3, F)
    return (v / np.sqrt(l2)).astype(F)


def _reflect(v, n):
    return (v - 2.0 * F(v @ n) * n).astype(F)


def _refract(uv, n, ratio):
    cos_theta = min(F(-(uv @ n)), F(1.0))
    r_perp = (F(ratio) * (uv + cos_theta * n)).astype(F)
    r_par = (-np.sqrt(abs(F(1.0) - F(r_perp @ r_perp))) * n).astype(F)
    return (r_perp + r_par).astype(F)


def _schlick(cosine, ref_idx):
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return F(r0 + (1.0 - r0) * np.power(F(1.0) - cosine, F(5.0)))


def _random_in_unit_sphere(rng: LCG):
    while True:
        p = np.array([rng.rand() * 2 - 1, rng.rand() * 2 - 1,
                      rng.rand() * 2 - 1], F)
        if float(p @ p) < 1.0:
            return p


def _random_cosine_direction(rng: LCG):
    r1 = rng.rand()
    r2 = rng.rand()
    z = np.sqrt(F(1.0) - r2)
    phi = F(2.0) * PI * r1
    return np.array([np.cos(phi) * np.sqrt(r2), np.sin(phi) * np.sqrt(r2), z], F)


def _build_onb(n):
    w = _norm(n)
    a = np.array([0, 1, 0], F) if abs(w[0]) > 0.9 else np.array([1, 0, 0], F)
    v = _norm(np.cross(w, a))
    u = np.cross(v, w).astype(F)
    return u, v, w


def _sample_cosine_hemisphere(normal, rng: LCG):
    u, v, w = _build_onb(normal)
    local = _random_cosine_direction(rng)
    world = _norm(u * local[0] + v * local[1] + w * local[2])
    cos_t = max(F(0.0), F(world @ normal))
    pdf = cos_t / PI if cos_t > 0 else F(0.0)
    return world, F(pdf)


def _sample_quad_light(sc, j, origin, rng: LCG):
    """Quad light sample + pdf_value (inc/qaud.h:74-88); 2 draws."""
    r1 = rng.rand()
    r2 = rng.rand()
    p_l = (sc.quad_q[j] + r1 * sc.quad_u[j] + r2 * sc.quad_v[j]).astype(F)
    to_light = (p_l - origin).astype(F)
    dist2 = F(to_light @ to_light)
    dist = F(np.sqrt(dist2))
    if dist <= 1e-3:
        return np.array([0, 0, 1], F), F(0.0)
    wi = (to_light / dist).astype(F)
    cos_l = abs(F(wi @ sc.quad_n[j]))
    area = F(sc.quad_area[j])
    if cos_l <= 1e-8 or area <= 0.0:
        return wi, F(0.0)
    return wi, F(dist2 / (cos_l * area))


def _sample_sphere_light(center, radius, origin, rng: LCG):
    z = F(2.0) * rng.rand() - F(1.0)
    phi = F(2.0) * PI * rng.rand()
    r = np.sqrt(max(F(0.0), F(1.0) - z * z))
    local = np.array([r * np.cos(phi), r * np.sin(phi), z], F)
    p_light = (center + radius * local).astype(F)
    to_light = (p_light - origin).astype(F)
    dist2 = F(to_light @ to_light)
    dist = np.sqrt(dist2)
    if dist <= 0.0:
        return np.array([0, 0, 1], F), F(0.0)
    wi = (to_light / dist).astype(F)
    n_light = _norm(p_light - center)
    cos_l = max(F(0.0), F(n_light @ (-wi)))
    if cos_l <= 0.0:
        return wi, F(0.0)
    area = F(4.0) * PI * radius * radius
    return wi, F(dist2 / (cos_l * area))


class OracleScene:
    """NumPy view of a built Scene pytree."""

    def __init__(self, scene):
        g = lambda a: np.asarray(a)
        self.tri_v0 = g(scene.tri_v0); self.tri_v1 = g(scene.tri_v1)
        self.tri_v2 = g(scene.tri_v2)
        self.tri_n0 = g(scene.tri_n0); self.tri_n1 = g(scene.tri_n1)
        self.tri_n2 = g(scene.tri_n2)
        self.tri_uv0 = g(scene.tri_uv0); self.tri_uv1 = g(scene.tri_uv1)
        self.tri_uv2 = g(scene.tri_uv2)
        self.tri_mat = g(scene.tri_mat); self.tri_tex = g(scene.tri_tex)
        self.sph_center = g(scene.sph_center)
        self.sph_center2 = g(scene.sph_center2)
        self.has_moving = bool(scene.has_moving)
        self.sph_radius = g(scene.sph_radius)
        self.sph_mat = g(scene.sph_mat)
        self.quad_q = g(scene.quad_q); self.quad_u = g(scene.quad_u)
        self.quad_v = g(scene.quad_v); self.quad_n = g(scene.quad_n)
        self.quad_w = g(scene.quad_w); self.quad_d = g(scene.quad_d)
        self.quad_area = g(scene.quad_area)
        self.quad_mat = g(scene.quad_mat)
        self.n_quads = scene.n_quads
        self.light_kind = g(scene.light_kind)
        self.mat_type = g(scene.mat_type)
        self.mat_albedo = g(scene.mat_albedo)
        self.mat_emissive = g(scene.mat_emissive)
        self.mat_fuzz = g(scene.mat_fuzz)
        self.mat_ref_idx = g(scene.mat_ref_idx)
        self.tex_pool = g(scene.tex_pool)
        self.tex_w = g(scene.tex_w); self.tex_h = g(scene.tex_h)
        self.tex_off = g(scene.tex_off)
        self.med_kind = g(scene.med_kind)
        self.med_center = g(scene.med_center)
        self.med_radius = g(scene.med_radius)
        self.med_min = g(scene.med_min)
        self.med_max = g(scene.med_max)
        self.med_nid = g(scene.med_neg_inv_density)
        self.med_albedo = g(scene.med_albedo)
        self.n_media = scene.n_media
        self.sun_dir = g(scene.sun_dir).astype(F)
        self.sun_radiance = g(scene.sun_radiance).astype(F)
        self.sun_enabled = scene.sun_enabled
        self.n_tris = scene.n_tris
        self.n_spheres = scene.n_spheres
        self.n_textures = scene.n_textures
        self.n_lights = scene.n_lights
        self.light_idx = g(scene.light_idx)
        self.seed = scene.seed
        self.env_tex = int(getattr(scene, "env_tex", -1))
        self.env_rotation = float(getattr(scene, "env_rotation", 0.0))
        self.env_scale = float(getattr(scene, "env_scale", 1.0))


def _hit_triangle(sc, i, ro, rd, t_min, t_max):
    v0, v1, v2 = sc.tri_v0[i], sc.tri_v1[i], sc.tri_v2[i]
    e1 = (v1 - v0).astype(F)
    e2 = (v2 - v0).astype(F)
    pvec = np.cross(rd, e2).astype(F)
    det = F(e1 @ pvec)
    if abs(det) < 1e-8:
        return None
    inv_det = F(1.0) / det
    tvec = (ro - v0).astype(F)
    u = F(tvec @ pvec) * inv_det
    if u < 0.0 or u > 1.0:
        return None
    qvec = np.cross(tvec, e1).astype(F)
    v = F(rd @ qvec) * inv_det
    if v < 0.0 or u + v > 1.0:
        return None
    t = F(e2 @ qvec) * inv_det
    if t < t_min or t > t_max:
        return None
    w = F(1.0) - u - v
    n = _norm(w * sc.tri_n0[i] + u * sc.tri_n1[i] + v * sc.tri_n2[i])
    front = F(rd @ n) < 0.0
    normal = n if front else (-n).astype(F)
    return dict(t=t, u=u, v=v, normal=normal, front=front,
                mat=int(sc.tri_mat[i]), tex=int(sc.tri_tex[i]), tri=int(i))


def scene_hit(sc: OracleScene, ro, rd, t_min, t_max, time=None):
    """Brute-force all triangles in tri order, then sequential spheres,
    matching scene_hit semantics incl. `<=` tie acceptance.  `time`
    evaluates moving-sphere centers at c0 + t*(c2-c0)."""
    best = None
    closest = F(t_max)
    for i in range(sc.n_tris):
        h = _hit_triangle(sc, i, ro, rd, t_min, closest)
        if h is not None:
            best = h
            closest = h["t"]
    for i in range(sc.n_spheres):
        c = sc.sph_center[i]
        if time is not None and sc.has_moving:
            c = (c + F(time) * (sc.sph_center2[i] - c)).astype(F)
        r = F(sc.sph_radius[i])
        oc = (ro - c).astype(F)
        a = F(rd @ rd)
        half_b = F(oc @ rd)
        cq = F(oc @ oc) - r * r
        disc = half_b * half_b - a * cq
        if disc < 0.0:
            continue
        sq = F(np.sqrt(disc))
        root = (-half_b - sq) / a
        if root < t_min or root > closest:
            root = (-half_b + sq) / a
            if root < t_min or root > closest:
                continue
        p = (ro + root * rd).astype(F)
        n = ((p - c) / r).astype(F)
        front = F(rd @ n) < 0.0
        best = dict(t=F(root), u=F(0.0), v=F(0.0),
                    normal=n if front else (-n).astype(F), front=front,
                    mat=int(sc.sph_mat[i]), tex=-1, tri=-1)
        closest = F(root)
    for i in range(sc.n_quads):
        # quad.hit (inc/qaud.h:31-72)
        qn = sc.quad_n[i]
        denom = F(rd @ qn)
        if abs(denom) < 1e-8:
            continue
        t = F((sc.quad_d[i] - F(ro @ qn)) / denom)
        if t < t_min or t > closest:
            continue
        p = (ro + t * rd).astype(F)
        pl = (p - sc.quad_q[i]).astype(F)
        alpha = F(sc.quad_w[i] @ np.cross(pl, sc.quad_v[i]).astype(F))
        beta = F(sc.quad_w[i] @ np.cross(sc.quad_u[i], pl).astype(F))
        if alpha < 0.0 or alpha > 1.0 or beta < 0.0 or beta > 1.0:
            continue
        front = denom < 0.0
        best = dict(t=t, u=F(alpha), v=F(beta),
                    normal=qn.astype(F) if front else (-qn).astype(F),
                    front=front, mat=int(sc.quad_mat[i]), tex=-1, tri=-1)
        closest = t
    return best


def _medium_interval(sc, m, ro, rd):
    """Entry/exit of medium m's boundary (sphere or box), unclipped."""
    if sc.med_kind[m] == 0:
        c = sc.med_center[m]
        r = F(sc.med_radius[m])
        oc = (ro - c).astype(F)
        a = F(rd @ rd)
        half_b = F(oc @ rd)
        cq = F(oc @ oc) - r * r
        disc = half_b * half_b - a * cq
        if disc <= 0.0:
            return None
        sq = F(np.sqrt(disc))
        return F((-half_b - sq) / a), F((-half_b + sq) / a)
    t0, t1 = F(-3e38), F(3e38)
    for axis in range(3):
        inv = F(1.0) / rd[axis]
        ta = (sc.med_min[m, axis] - ro[axis]) * inv
        tb = (sc.med_max[m, axis] - ro[axis]) * inv
        t0 = max(t0, min(ta, tb))
        t1 = min(t1, max(ta, tb))
    if t1 > t0:
        return F(t0), F(t1)
    return None


def scene_hit_with_media(sc, ro, rd, t_min, t_max, rng, time=None):
    """scene_hit + probabilistic constant-medium hits, mirroring
    ops/trace.py media_pass draw-for-draw (one rand per medium per call)."""
    rec = scene_hit(sc, ro, rd, t_min, t_max, time=time)
    if sc.n_media == 0:
        return rec
    rlen = F(np.sqrt(float(rd @ rd)))
    closest = rec["t"] if rec is not None else F(t_max)
    for m in range(sc.n_media):
        iv = _medium_interval(sc, m, ro, rd)
        u = rng.rand()  # uniform draw schedule (media_pass draws always)
        if iv is None:
            continue
        e0 = max(iv[0], t_min)
        e1 = min(iv[1], closest)
        if not e0 < e1:
            continue
        dist_inside = (e1 - e0) * rlen
        hit_dist = F(sc.med_nid[m]) * F(np.log(max(u, F(1e-30))))
        if hit_dist <= dist_inside:
            t = F(e0 + hit_dist / max(rlen, F(1e-30)))
            rec = dict(t=t, u=F(0.0), v=F(0.0),
                       normal=np.array([1, 0, 0], F), front=True,
                       mat=0, tex=-1, tri=-1, medium=m)
            closest = t
    return rec


def _tex2d(sc, tex_id, u, v):
    if tex_id < 0 or tex_id >= sc.n_textures:
        return np.ones(3, F)
    w = int(sc.tex_w[tex_id]); h = int(sc.tex_h[tex_id])
    off = int(sc.tex_off[tex_id])
    u = u - np.floor(u)
    v = v - np.floor(v)
    i = int(u * (w - 1))
    j = int((1.0 - v) * (h - 1))
    idx = off + (j * w + i) * 3
    if idx < 0 or idx + 2 >= len(sc.tex_pool):
        return np.ones(3, F)
    return sc.tex_pool[idx:idx + 3].astype(F)


def _atan2f(y, x):
    """The shared polynomial atan2 (ops/textures.py atan2f) in f32
    NumPy — one formula for oracle, XLA and Pallas so texel picks agree
    (Mosaic has no atan2/acos lowering)."""
    from dsrt_tpu.ops.textures import _ATAN_C as C
    ax, ay = np.abs(x), np.abs(y)
    mx, mn = np.maximum(ax, ay), np.minimum(ax, ay)
    t = F(mn) / np.maximum(F(mx), F(1e-30))
    s = F(t * t)
    p = F(C[0]) + s * (F(C[1]) + s * (F(C[2]) + s * (
        F(C[3]) + s * (F(C[4]) + s * F(C[5])))))
    p = F(t * p)
    r = F(np.pi / 2) - p if ay > ax else p
    if x < 0:
        r = F(np.pi) - r
    return -r if y < 0 else r


def _env_radiance(sc, rd):
    """Equirect environment-map sky (ops/textures.py sample_env mirror,
    f32 arithmetic step for step so nearest-neighbor texel picks agree):
    u = atan2(z,x)/2pi + 0.5 + rot, +y maps to the top row."""
    rd = np.asarray(rd, F)
    inv_len = F(1.0) / np.sqrt(np.maximum(
        rd[0] * rd[0] + rd[1] * rd[1] + rd[2] * rd[2], F(1e-20)))
    u = (_atan2f(rd[2] * inv_len, rd[0] * inv_len) / F(2.0 * np.pi)
         + F(0.5) + F(sc.env_rotation) / F(2.0 * np.pi))
    cy = np.clip(rd[1] * inv_len, F(-1.0), F(1.0))
    acos = _atan2f(np.sqrt(np.maximum(F(1.0) - cy * cy, F(0.0))), cy)
    v = F(1.0) - acos / F(np.pi)
    v = np.clip(v, F(0.0), F(1.0 - 1e-6))
    return (_tex2d(sc, sc.env_tex, F(u), F(v)) * F(sc.env_scale)).astype(F)


def ray_color(sc: OracleScene, ro, rd, rng: LCG, max_depth: int,
              rr_start: int = 5, rr_max_p: float = 0.95, time=None):
    L = np.zeros(3, F)
    thr = np.ones(3, F)
    if max_depth <= 0:
        max_depth = 12
    for depth in range(max_depth):
        if depth >= rr_start:
            p = min(F(max(thr[0], max(thr[1], thr[2]))), F(rr_max_p))
            if rng.rand() > p:
                break
            thr = (thr / p).astype(F)

        rec = scene_hit_with_media(sc, ro, rd, F(1e-3), F(1e9), rng,
                                   time=time)
        if rec is None:
            if sc.env_tex >= 0:     # env-map sky extension (else black)
                L = (L + thr * _env_radiance(sc, rd)).astype(F)
            break

        if rec.get("medium", -1) >= 0:
            # isotropic in-medium scatter (ops/shade.py medium branch)
            m = rec["medium"]
            p = (ro + rec["t"] * rd).astype(F)
            d = _norm(_random_in_unit_sphere(rng))
            thr = (thr * sc.med_albedo[m].astype(F)).astype(F)
            ro, rd = p, d
            continue

        mtype = sc.mat_type[rec["mat"]]
        if mtype == DIFFUSE_LIGHT:
            L = (L + thr * sc.mat_emissive[rec["mat"]]).astype(F)
            break

        p = (ro + rec["t"] * rd).astype(F)
        n = rec["normal"]
        albedo = sc.mat_albedo[rec["mat"]].astype(F)
        if rec["tex"] >= 0:
            i = rec["tri"]
            w = F(1.0) - rec["u"] - rec["v"]
            u_tex = (w * sc.tri_uv0[i, 0] + rec["u"] * sc.tri_uv1[i, 0]
                     + rec["v"] * sc.tri_uv2[i, 0])
            v_tex = (w * sc.tri_uv0[i, 1] + rec["u"] * sc.tri_uv1[i, 1]
                     + rec["v"] * sc.tri_uv2[i, 1])
            albedo = (albedo * _tex2d(sc, rec["tex"], F(u_tex), F(v_tex))).astype(F)

        if mtype in (METAL, DIELECTRIC):
            if mtype == DIELECTRIC:
                eta = F(sc.mat_ref_idx[rec["mat"]])
                if eta <= 0.0 or not np.isfinite(eta):
                    eta = F(1.5)
                ratio = F(1.0) / eta if rec["front"] else eta
                unit = _norm(rd)
                cos_t = min(F(-(unit @ n)), F(1.0))
                sin_t = np.sqrt(max(F(0.0), F(1.0) - cos_t * cos_t))
                cannot = ratio * sin_t > 1.0
                refl_prob = _schlick(cos_t, ratio)
                if cannot or refl_prob > rng.rand():
                    d = _reflect(unit, n)
                else:
                    d = _refract(unit, n, ratio)
                ro, rd = p, d
                continue
            # metal
            refl = _reflect(_norm(rd), n)
            fuzz = min(max(F(sc.mat_fuzz[rec["mat"]]), F(0.0)), F(1.0))
            d = (refl + fuzz * _random_in_unit_sphere(rng)).astype(F)
            if F(d @ n) <= 0.0:
                break
            thr = (thr * albedo).astype(F)
            ro, rd = p, d
            continue

        # diffuse: sun MIS first
        if sc.sun_enabled:
            ldir = _norm(-sc.sun_dir)
            cos_sun = max(F(0.0), F(n @ ldir))
            if cos_sun > 0.0:
                sh_o = (p + F(1e-3) * n).astype(F)
                if scene_hit_with_media(sc, sh_o, ldir, F(1e-3), F(1e9),
                                        rng, time=time) is None:
                    pdf_brdf = cos_sun / PI
                    pdf_mix = F(0.5) * F(1.0) + F(0.5) * pdf_brdf
                    weight = (cos_sun / PI) / pdf_mix
                    L = (L + thr * albedo * sc.sun_radiance * weight).astype(F)

        if sc.n_lights == 0:
            d, pdf_b = _sample_cosine_hemisphere(n, rng)
            if pdf_b <= 0:
                break
            cos_t = max(F(0.0), F(d @ n))
            thr = (thr * albedo * ((cos_t / PI) / pdf_b)).astype(F)
            ro, rd = p, d
            continue

        choose = rng.rand()
        if choose < 0.5:
            k = int(rng.rand() * sc.n_lights)
            if k >= sc.n_lights:
                k = sc.n_lights - 1
            si = int(sc.light_idx[k])
            if int(sc.light_kind[k]) == 1:
                d, pdf_lc = _sample_quad_light(sc, si, p, rng)
            else:
                d, pdf_lc = _sample_sphere_light(
                    sc.sph_center[si], F(sc.sph_radius[si]), p, rng)
            if pdf_lc <= 0:
                break
            cos_t = max(F(0.0), F(d @ n))
            if cos_t <= 0:
                break
            pdf_light = pdf_lc / F(sc.n_lights)
            pdf_val = F(0.5) * pdf_light + F(0.5) * (cos_t / PI)
        else:
            d, pdf_b = _sample_cosine_hemisphere(n, rng)
            if pdf_b <= 0:
                break
            pdf_val = F(0.5) * pdf_b

        cos_t = max(F(0.0), F(d @ n))
        weight = (cos_t / PI) / pdf_val
        thr = (thr * albedo * weight).astype(F)
        ro, rd = p, d

    return np.clip(L, 0.0, 1.0).astype(F)


def render_oracle(scene, cam, cfg):
    """Full oracle render -> (u8 image, float radiance image), both
    (H, W, 3) with row 0 = top (the reference's y-flip applied)."""
    sc = OracleScene(scene)
    W, H = cfg.width, cfg.height
    spp = max(1, cfg.spp)
    origin = np.asarray(cam.origin, F)
    ll = np.asarray(cam.lower_left, F)
    hz = np.asarray(cam.horizontal, F)
    vt = np.asarray(cam.vertical, F)

    fimg = np.zeros((H, W, 3), F)
    for y in range(H):
        for x in range(W):
            rng = LCG(np.uint32(x + y * W) ^ np.uint32(sc.seed & 0xFFFFFFFF))
            accum = np.zeros(3, F)
            for s in range(spp):
                jx = (F(s) + rng.rand()) / F(spp)
                jy = (F(s) + rng.rand()) / F(spp)
                u = (F(x) + jx) / F(W - 1)
                v = (F(y) + jy) / F(H - 1)
                rd = (ll + u * hz + v * vt - origin).astype(F)
                if cfg.time1 > cfg.time0:
                    # shutter draw, same schedule slot as the renderers
                    time = F(cfg.time0) + rng.rand() * F(cfg.time1
                                                         - cfg.time0)
                else:
                    time = None
                accum += ray_color(sc, origin, rd, rng,
                                   cfg.max_depth, cfg.rr_start_depth,
                                   cfg.rr_max_p, time=time)
            fimg[H - 1 - y, x] = accum / F(spp)

    c = np.clip(fimg, 0.0, None)
    c = np.minimum(c, cfg.firefly_clamp)
    c = np.power(c, F(1.0 / cfg.gamma))
    c = np.clip(c, 0.0, 1.0)
    return (F(255.99) * c).astype(np.uint8), fimg
