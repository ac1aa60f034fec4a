"""The 7 shader pipelines as pure, vectorized fragment functions.

Each reference fragment shader (src/scene/shader.rs:282-963) becomes a pure
function over batched fragment data: any leading batch shape (the JAX
renderer uses (H, W), the NumPy oracle uses flat (N,)) with per-fragment
triangle attributes already gathered.  Immediate-mode shading in the
reference is output-equivalent to this deferred shading because fragment
shaders have no side effects besides the z/shadow writes the raster stage
already resolved (SURVEY.md §2.2.4).

xp-agnostic: the same code runs under numpy (oracle) and jax.numpy (device).
"""

from __future__ import annotations

import numpy as np

from ..ops import mathlib as ml

BLACK = np.zeros(3, dtype=np.uint8)
WHITE = np.full(3, 255, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Texture samplers (src/scene/util.rs:34-83)
# ---------------------------------------------------------------------------


def _tex_coords(uv, w, h, xp):
    """(uv * dims) as u32, clamped into range.

    The reference does not clamp and would panic on out-of-range coordinates
    (util.rs:35-40); clamping is a documented divergence (SURVEY.md §2.2.5).
    """
    cx = ml.rust_f32_to_u32(uv[..., 0] * xp.float32(w), xp)
    cy = ml.rust_f32_to_u32(uv[..., 1] * xp.float32(h), xp)
    cx = xp.minimum(cx, xp.uint32(w - 1)).astype(xp.int32)
    cy = xp.minimum(cy, xp.uint32(h - 1)).astype(xp.int32)
    return cx, cy


def sample_color(textures, uv, xp):
    """get_color_at_uv (util.rs:34-41): nearest-neighbor RGB fetch."""
    tex = textures["texture"]
    cx, cy = _tex_coords(uv, tex.shape[1], tex.shape[0], xp)
    return tex[cy, cx]


def _decode_normal(rgb, xp):
    """byte/255 - 0.5 per channel, then normalize (util.rs:51-56)."""
    v = rgb.astype(xp.float32) / xp.float32(255.0) - xp.float32(0.5)
    return ml.normalize3(v, xp)


def sample_normal(textures, uv, xp):
    """get_normal_at_uv (util.rs:44-57)."""
    tex = textures["normal_map"]
    cx, cy = _tex_coords(uv, tex.shape[1], tex.shape[0], xp)
    return _decode_normal(tex[cy, cx], xp)


def sample_normal_tangent(textures, uv, xp):
    """get_normal_tangent_at_uv (util.rs:60-73).

    Reference quirk preserved: texel coordinates are computed from the
    *normal_map* dimensions but the fetch reads *normal_map_tangent*
    (util.rs:61-70).
    """
    nm = textures["normal_map"]
    tex = textures["normal_map_tangent"]
    cx, cy = _tex_coords(uv, nm.shape[1], nm.shape[0], xp)
    cx = xp.minimum(cx, tex.shape[1] - 1)
    cy = xp.minimum(cy, tex.shape[0] - 1)
    return _decode_normal(tex[cy, cx], xp)


def sample_specular(textures, uv, xp):
    """get_specular_value_at_uv (util.rs:76-83): RAW byte 0..255 — used
    directly as the specular exponent (shader.rs:521-525)."""
    tex = textures["specular_map"]
    cx, cy = _tex_coords(uv, tex.shape[1], tex.shape[0], xp)
    return tex[cy, cx, 0].astype(xp.float32)


_SAMPLERS = {
    "texture": sample_color,
    "normal_map": sample_normal,
    "normal_map_tangent": sample_normal_tangent,
    "specular_map": sample_specular,
}


def sample_maps(textures, uv, names, xp):
    """Fetch several maps at one uv, with a single packed gather when all
    maps share dimensions (TPU gathers cost per row — one wide fetch beats
    several narrow ones).  Falls back to the per-map samplers (preserving
    the tangent-map dimension quirk, util.rs:61-70) on mismatched dims.
    Returns {name: decoded sample} matching the individual samplers.
    """
    texs = [textures[n] for n in names]
    dims = {t.shape[:2] for t in texs}
    # The tangent map's texel coords come from the *normal_map* dims
    # (util.rs:61-70); the packed path is only valid if those match too.
    if "normal_map_tangent" in names:
        dims.add(textures["normal_map"].shape[:2])
    if len(names) == 1 or len(dims) != 1:
        return {n: _SAMPLERS[n](textures, uv, xp) for n in names}

    packed = xp.concatenate(texs, axis=-1)
    h, w = texs[0].shape[:2]
    cx, cy = _tex_coords(uv, w, h, xp)
    g = packed[cy, cx]  # (..., 3 * len(names))
    out = {}
    for i, n in enumerate(names):
        raw = g[..., 3 * i : 3 * i + 3]
        if n in ("normal_map", "normal_map_tangent"):
            out[n] = _decode_normal(raw, xp)
        elif n == "specular_map":
            out[n] = raw[..., 0].astype(xp.float32)
        else:
            out[n] = raw
    return out


# ---------------------------------------------------------------------------
# Shared fragment helpers
# ---------------------------------------------------------------------------


def interp_uv(frag, xp):
    """uv = vertex_uvs * bar (Matrix2x3 * Vector3 row dots, shader.rs:327)."""
    bar = frag["bar"]
    uvs = frag["uv"]  # (..., 3 vertices, 2)
    u = (uvs[..., 0, 0] * bar[..., 0] + uvs[..., 1, 0] * bar[..., 1]) + uvs[..., 2, 0] * bar[..., 2]
    v = (uvs[..., 0, 1] * bar[..., 0] + uvs[..., 1, 1] * bar[..., 1]) + uvs[..., 2, 1] * bar[..., 2]
    return xp.stack([u, v], axis=-1)


def frag_z(frag):
    """bar . vertex_z_values (shader.rs:174)."""
    bar, zv = frag["bar"], frag["zv"]
    return (bar[..., 0] * zv[..., 0] + bar[..., 1] * zv[..., 1]) + bar[..., 2] * zv[..., 2]


def mat3_vec(m, v, xp):
    """Matrix3 * Vector3 with nalgebra accumulation order."""
    out = []
    for i in range(3):
        out.append(
            (m[..., i, 0] * v[..., 0] + m[..., i, 1] * v[..., 1]) + m[..., i, 2] * v[..., 2]
        )
    return xp.stack(out, axis=-1)


def _shadow_fetch(shadow_buffer, sx, sy, width, xp):
    """shadow_buffer[round(x) as u32 + round(y) as u32 * width].

    The reference's u32 cast saturates negatives to 0; the final index is
    unchecked and would panic out of range (shader.rs:774-778) — we clamp
    (documented divergence).
    """
    ix = ml.rust_f32_to_u32(ml.rust_round(sx, xp), xp)
    iy = ml.rust_f32_to_u32(ml.rust_round(sy, xp), xp)
    flat = ix + iy * xp.uint32(width)
    size = shadow_buffer.shape[0] * shadow_buffer.shape[1]
    flat = xp.minimum(flat, xp.uint32(size - 1)).astype(xp.int32)
    return shadow_buffer.reshape(-1)[flat]


# ---------------------------------------------------------------------------
# Pipelines
# ---------------------------------------------------------------------------


def shade_default(frag, uniforms, textures, config, xp):
    """Flat shading (shader.rs:318-333): texture * face diffuse."""
    uv = interp_uv(frag, xp)
    color = sample_color(textures, uv, xp)
    diff = frag["intensity"][..., 0]
    return ml.color_blend(color, xp.asarray(BLACK), diff, xp)


def shade_phong(frag, uniforms, textures, config, xp):
    """Gouraud-interpolated intensity (shader.rs:386-401)."""
    uv = interp_uv(frag, xp)
    color = sample_color(textures, uv, xp)
    bar, ints = frag["bar"], frag["intensity"]
    diff = (bar[..., 0] * ints[..., 0] + bar[..., 1] * ints[..., 1]) + bar[..., 2] * ints[..., 2]
    return ml.color_blend(color, xp.asarray(BLACK), diff, xp)


def shade_normal_map(frag, uniforms, textures, config, xp):
    """World-space normal map lookup (shader.rs:439-457)."""
    uv = interp_uv(frag, xp)
    s = sample_maps(textures, uv, ("texture", "normal_map"), xp)
    color, n = s["texture"], s["normal_map"]
    t_n = ml.normalize3(ml.mat4_transform_vector(uniforms["it_m"], n, xp), xp)
    diff = ml.dot3(uniforms["t_light_direction"], t_n)
    return ml.color_blend(color, xp.asarray(BLACK), diff, xp)


def shade_specular(frag, uniforms, textures, config, xp):
    """Normal-map diffuse + Phong specular (shader.rs:498-534)."""
    uv = interp_uv(frag, xp)
    s = sample_maps(textures, uv, ("texture", "normal_map", "specular_map"), xp)
    color = s["texture"].astype(xp.float32)
    n = s["normal_map"]
    t_n = ml.normalize3(ml.mat4_transform_vector(uniforms["it_m"], n, xp), xp)
    l = uniforms["t_light_direction"]
    d = ml.dot3(l, t_n)
    reflected = ml.normalize3(
        xp.float32(2.0) * (t_n * d[..., None]) - l, xp
    )
    # Camera-frame trick: only .z of the reflection matters since the camera
    # direction is (0,0,-1) in its own frame (shader.rs:520-525).
    spec_exp = s["specular_map"]
    spec = xp.float32(config.specular_scale) * xp.power(
        xp.maximum(reflected[..., 2], xp.float32(0.0)), spec_exp
    )
    coef = (d + spec)[..., None]
    corrected = xp.minimum(coef * color, xp.float32(255.0))
    return ml.rust_f32_to_u8(corrected, xp)


def shade_darboux(frag, uniforms, textures, config, xp):
    """Tangent-space (Darboux) normal mapping (shader.rs:597-654)."""
    uv = interp_uv(frag, xp)
    s = sample_maps(textures, uv, ("texture", "normal_map_tangent"), xp)
    color, tn_sample = s["texture"], s["normal_map_tangent"]

    bar = frag["bar"]
    t_pos = frag["t_pos"]    # (..., 3 vertices, 3)
    t_norm = frag["t_norm"]  # (..., 3 vertices, 3)

    # vertex_t_positions * (-1, 1, 0) = p1 - p0; * (-1, 0, 1) = p2 - p0.
    row0 = ml.normalize3(t_pos[..., 1, :] - t_pos[..., 0, :], xp)
    row1 = ml.normalize3(t_pos[..., 2, :] - t_pos[..., 0, :], xp)
    # vertex_t_normals * bar (columns are vertex normals).
    local_z = (
        t_norm[..., 0, :] * bar[..., 0:1]
        + t_norm[..., 1, :] * bar[..., 1:2]
    ) + t_norm[..., 2, :] * bar[..., 2:3]
    row2 = ml.normalize3(local_z, xp)
    basis = xp.stack([row0, row1, row2], axis=-2)
    i_basis = ml.mat3_inverse(basis, xp)

    uvs = frag["uv"]
    du = xp.stack(
        [uvs[..., 1, 0] - uvs[..., 0, 0], uvs[..., 2, 0] - uvs[..., 0, 0],
         xp.zeros_like(uvs[..., 0, 0])],
        axis=-1,
    )
    dv = xp.stack(
        [uvs[..., 1, 1] - uvs[..., 0, 1], uvs[..., 2, 1] - uvs[..., 0, 1],
         xp.zeros_like(uvs[..., 0, 1])],
        axis=-1,
    )
    local_x = mat3_vec(i_basis, du, xp)
    local_y = mat3_vec(i_basis, dv, xp)

    col_x = ml.normalize3(local_x, xp)
    col_y = ml.normalize3(local_y, xp)
    col_z = ml.normalize3(local_z, xp)
    # transform matrix has columns (x, y, z); applied to the sampled normal.
    t_fragment_normal = ml.normalize3(
        col_x * tn_sample[..., 0:1] + col_y * tn_sample[..., 1:2] + col_z * tn_sample[..., 2:3],
        xp,
    )
    diff = ml.dot3(uniforms["t_light_direction"], t_fragment_normal)
    return ml.color_blend(color, xp.asarray(BLACK), diff, xp)


def shade_shadow(frag, uniforms, textures, config, xp):
    """Shadow pass 2 (shader.rs:749-788): phong + shadow-map depth compare.

    `uniforms` must contain shadow_matrix (pass 1 vpmv), i_vpmv, and
    `shadow_buffer` must be in frag (full (H, W) f32 from pass 1).
    """
    x = frag["x"].astype(xp.float32)
    y = frag["y"].astype(xp.float32)
    z = frag_z(frag)
    sm = ml.mat4_mul(uniforms["shadow_matrix"], uniforms["i_vpmv"])
    p = xp.stack([x, y, z], axis=-1)
    sc = ml.mat4_transform_point(sm, p, xp)
    shadow_val = _shadow_fetch(
        frag["shadow_buffer"], sc[..., 0], sc[..., 1], config.width, xp
    )
    shadow_coef = xp.where(
        sc[..., 2] + xp.float32(config.shadow_bias) < shadow_val,
        xp.float32(config.shadow_dim),
        xp.float32(1.0),
    )
    uv = interp_uv(frag, xp)
    color = sample_color(textures, uv, xp)
    bar, ints = frag["bar"], frag["intensity"]
    diff = (bar[..., 0] * ints[..., 0] + bar[..., 1] * ints[..., 1]) + bar[..., 2] * ints[..., 2]
    return ml.color_blend(color, xp.asarray(BLACK), diff * shadow_coef, xp)


def shade_occlusion(frag, uniforms, textures, config, xp):
    """Occlusion pass 2 (shader.rs:872-947): 16-sample circular probe of the
    shadow buffer in the plane perpendicular to the light; grayscale output."""
    x = frag["x"].astype(xp.float32)
    y = frag["y"].astype(xp.float32)
    z = frag_z(frag)
    p = xp.stack([x, y, z], axis=-1)

    light = ml.mat4_transform_vector(uniforms["i_m"], uniforms["t_light_direction"], xp)
    world = ml.mat4_transform_point(uniforms["i_vpmv"], p, xp)
    sm = ml.mat4_mul(uniforms["shadow_matrix"], uniforms["i_vpmv"])
    fsc = ml.mat4_transform_point(sm, p, xp)
    shadow_buffer = frag["shadow_buffer"]
    fval = _shadow_fetch(shadow_buffer, fsc[..., 0], fsc[..., 1], config.width, xp)

    rot = ml.rotation_between(
        xp.asarray(np.array([0.0, 0.0, 1.0], dtype=np.float32)), light, xp
    )

    n = config.occlusion_samples
    angle_coef = np.float32(2.0 * np.pi) / np.float32(n)
    inv_n = xp.float32(1.0) / xp.float32(n)
    step_size = xp.float32(config.occlusion_step)
    threshold = xp.float32(config.occlusion_threshold)
    depth_scale = xp.float32(config.occlusion_depth_scale)

    occ = xp.ones_like(fval)
    S = uniforms["shadow_matrix"]
    for i in range(n):
        ang = np.float32(angle_coef * np.float32(i))
        g = xp.asarray(np.array([np.sin(ang), 0.0, np.cos(ang)], dtype=np.float32))
        step_dir = mat3_vec(rot, g, xp)
        sample = world + step_dir * step_size
        ssc = ml.mat4_transform_point(S, sample, xp)
        sval = _shadow_fetch(shadow_buffer, ssc[..., 0], ssc[..., 1], config.width, xp)
        occluded = (sval - threshold) > fval
        strength = xp.minimum((sval - fval) / depth_scale, xp.float32(1.0))
        occ = xp.where(occluded, occ - inv_n * strength, occ)

    return ml.color_blend(xp.asarray(WHITE), xp.asarray(BLACK), occ, xp)
