"""Independent per-pipeline fragment fixtures.

The oracle shares mathlib/vertex/shaders with the device path, so oracle
parity only validates the raster loop.  These fixtures anchor the SHADING
math independently: every expected RGB is recomputed here by a scalar
float64 transcription of the Rust source (file:line cited per helper) that
shares NO code with tiny_renderer_tpu.  A transcription error injected into
any shade_* function fails these tests without going through the oracle.

Inputs (frag varyings, uniforms matrices, textures) are literal values, so
nothing from mathlib's prepare stack is exercised here either.

Fixture robustness: each expected channel value is asserted to sit > 1e-3
away from its u8 cast boundary, so float32-vs-float64 noise cannot flip
the expected byte.
"""

import math

import numpy as np
import pytest

from tiny_renderer_tpu import RenderConfig
from tiny_renderer_tpu.pipelines import shaders


# ---------------------------------------------------------------------------
# Independent scalar transcription of the Rust fragment semantics (float64).
# ---------------------------------------------------------------------------


def ref_u8_cast(x):
    """Rust `as u8`: NaN -> 0, saturate to [0, 255], truncate toward zero."""
    if math.isnan(x):
        return 0
    if x < 0.0:
        return 0
    if x > 255.0:
        return 255
    return int(x)  # trunc toward zero


def ref_color_blend(c1, c2, t):
    """util.rs:7-13: (t*c1 + (1-t)*c2) as u8 per channel, t unclamped."""
    return tuple(ref_u8_cast(t * a + (1.0 - t) * b) for a, b in zip(c1, c2))


def ref_tex_color(tex, u, v):
    """util.rs:34-41: coord = (u*w) as u32, (v*h) as u32; nearest fetch."""
    h, w = tex.shape[:2]
    cx, cy = int(u * w), int(v * h)
    return tuple(int(c) for c in tex[cy, cx])


def ref_normalize(v):
    n = math.sqrt(sum(c * c for c in v))
    return tuple(c / n for c in v)


def ref_decode_normal(rgb):
    """util.rs:44-57: byte/255 - 0.5 per channel, normalized."""
    return ref_normalize(tuple(b / 255.0 - 0.5 for b in rgb))


def ref_dot(a, b):
    return sum(x * y for x, y in zip(a, b))


def ref_mat3_vec(m, v):
    return tuple(ref_dot(row, v) for row in m)


def ref_mat4_vector(m, v):
    """Vector3::from_homogeneous(M * v_h) with w = 0: upper 3x3 multiply."""
    return tuple(m[i][0] * v[0] + m[i][1] * v[1] + m[i][2] * v[2] for i in range(3))


def ref_mat4_point(m, p):
    """Point3::from_homogeneous(M * p_h): w = 1, divide by w'."""
    out = [m[i][0] * p[0] + m[i][1] * p[1] + m[i][2] * p[2] + m[i][3] for i in range(4)]
    return (out[0] / out[3], out[1] / out[3], out[2] / out[3])


def ref_mat4_mul(a, b):
    return [[sum(a[i][k] * b[k][j] for k in range(4)) for j in range(4)] for i in range(4)]


def ref_mat3_inverse(m):
    det = (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )
    inv = [
        [
            (m[1][1] * m[2][2] - m[1][2] * m[2][1]) / det,
            (m[0][2] * m[2][1] - m[0][1] * m[2][2]) / det,
            (m[0][1] * m[1][2] - m[0][2] * m[1][1]) / det,
        ],
        [
            (m[1][2] * m[2][0] - m[1][0] * m[2][2]) / det,
            (m[0][0] * m[2][2] - m[0][2] * m[2][0]) / det,
            (m[0][2] * m[1][0] - m[0][0] * m[1][2]) / det,
        ],
        [
            (m[1][0] * m[2][1] - m[1][1] * m[2][0]) / det,
            (m[0][1] * m[2][0] - m[0][0] * m[2][1]) / det,
            (m[0][0] * m[1][1] - m[0][1] * m[1][0]) / det,
        ],
    ]
    return inv


def ref_round(x):
    """f32::round: round half AWAY from zero (not banker's rounding)."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def assert_margin(value):
    """Fixture self-check: the pre-cast float must sit far from the cast
    boundary so f32/f64 noise cannot flip the expected byte."""
    if 0.001 < value < 254.999:
        frac = value - math.floor(value)
        assert min(frac, 1.0 - frac) > 1e-3, (
            f"fragile fixture: {value} too close to a u8 boundary"
        )


# ---------------------------------------------------------------------------
# Shared literal inputs
# ---------------------------------------------------------------------------

# 4x4 maps with distinct texels (indexable by eye).
TEX = np.zeros((4, 4, 3), np.uint8)
for _y in range(4):
    for _x in range(4):
        TEX[_y, _x] = (50 * _y + 10 * _x + 7, 100 + 10 * _x + _y, 200 - 20 * _y - _x)

NORMAL_MAP = np.zeros((4, 4, 3), np.uint8)
NORMAL_MAP[2, 1] = (255, 128, 0)     # mostly +x, slightly -z after decode
NORMAL_MAP[0, 3] = (128, 128, 255)   # ~ +z
NORMAL_MAP[1, 2] = (40, 220, 160)    # generic direction
NORMAL_MAP[3, 0] = (200, 160, 255)   # positive r.z, low exponent: the
                                     # specular term visibly moves the color

TANGENT_MAP = np.zeros((4, 4, 3), np.uint8)
TANGENT_MAP[2, 1] = (200, 90, 255)
TANGENT_MAP[0, 3] = (128, 128, 255)

SPEC_MAP = np.zeros((4, 4, 3), np.uint8)
SPEC_MAP[2, 1] = (4, 0, 0)    # exponent 4.0 — RAW byte (shader.rs:521-525)
SPEC_MAP[0, 3] = (0, 0, 0)    # exponent 0.0 -> powf(_, 0) == 1
SPEC_MAP[1, 2] = (30, 0, 0)   # large raw exponent
SPEC_MAP[3, 0] = (2, 0, 0)    # small exponent, r.z ~ 0.57: spec ~ +0.2

TEXTURES = {
    "texture": TEX,
    "normal_map": NORMAL_MAP,
    "normal_map_tangent": TANGENT_MAP,
    "specular_map": SPEC_MAP,
}

IDENTITY4 = np.eye(4, dtype=np.float32)
T_LIGHT = (0.0, 0.6, 0.8)  # unit vector, exactly representable

CFG = RenderConfig(width=128, height=8)

# uv points hitting texels (2,1), (0,3), (1,2) of a 4x4 map.
UVS = [(0.3, 0.6), (0.8, 0.1), (0.55, 0.3)]
UV_TEXELS = [(1, 2), (3, 0), (2, 1)]  # (cx, cy)


def _f32(x):
    return np.asarray(x, np.float32)


# ---------------------------------------------------------------------------
# default / phong: color_blend(texture, black, intensity)  (shader.rs:318-333,
# :386-401 — fragment math is identical once intensity is interpolated)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shade", [shaders.shade_default, shaders.shade_phong])
def test_diffuse_pipelines_fixture(shade):
    intensities = [0.77, -0.2, 0.97]  # negative: saturating cast -> black
    frag = {"uv": _f32(UVS), "intensity": _f32(intensities)}
    got = np.asarray(shade(frag, {}, TEXTURES, CFG, np))

    for i, (uv, t) in enumerate(zip(UVS, intensities)):
        color = ref_tex_color(TEX, *uv)
        for ch in range(3):
            assert_margin(t * color[ch])
        expected = ref_color_blend(color, (0, 0, 0), t)
        assert tuple(got[i]) == expected, f"fragment {i}: {tuple(got[i])} != {expected}"
    # Hand-checked literals for fragment 0: texel (cx=1, cy=2) has color
    # (117, 112, 159); t = 0.77 -> trunc(90.09, 86.24, 122.43).
    assert tuple(got[0]) == (90, 86, 122)


# ---------------------------------------------------------------------------
# normal_map: world-space normal fetch + it_m transform (shader.rs:439-467)
# ---------------------------------------------------------------------------


def test_normal_map_fixture():
    it_m = np.array(
        [
            [1.0, 0.5, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.25, 0.0, 2.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    uniforms = {"it_m": it_m, "t_light_direction": _f32(T_LIGHT)}
    frag = {"uv": _f32(UVS)}
    got = np.asarray(shaders.shade_normal_map(frag, uniforms, TEXTURES, CFG, np))

    m3 = [[1.0, 0.5, 0.0], [0.0, 1.0, 0.0], [0.25, 0.0, 2.0]]
    for i, uv in enumerate(UVS):
        color = ref_tex_color(TEX, *uv)
        n = ref_decode_normal(ref_tex_color(NORMAL_MAP, *uv))
        t_n = ref_normalize(ref_mat3_vec(m3, n))
        diff = ref_dot(T_LIGHT, t_n)
        for ch in range(3):
            assert_margin(diff * color[ch])
        expected = ref_color_blend(color, (0, 0, 0), diff)
        assert tuple(got[i]) == expected, f"fragment {i}: {tuple(got[i])} != {expected}"


# ---------------------------------------------------------------------------
# specular: diffuse + 0.6 * max(r.z, 0)^exp with RAW byte exponent and
# min(. , 255) clamp before the cast (shader.rs:498-534)
# ---------------------------------------------------------------------------


def test_specular_fixture():
    # (0.05, 0.9) hits texel (cx=0, cy=3): positive r.z with exponent 2 —
    # the fragment whose byte actually moves if the reflection math drifts.
    uvs = UVS + [(0.05, 0.9)]
    uniforms = {"it_m": IDENTITY4, "t_light_direction": _f32(T_LIGHT)}
    frag = {"uv": _f32(uvs)}
    got = np.asarray(shaders.shade_specular(frag, uniforms, TEXTURES, CFG, np))

    for i, uv in enumerate(uvs):
        color = ref_tex_color(TEX, *uv)
        n = ref_decode_normal(ref_tex_color(NORMAL_MAP, *uv))  # it_m = I
        d = ref_dot(T_LIGHT, n)
        reflected = ref_normalize(tuple(2.0 * c * d - l for c, l in zip(n, T_LIGHT)))
        exp = float(ref_tex_color(SPEC_MAP, *uv)[0])  # RAW byte exponent
        spec = 0.6 * max(reflected[2], 0.0) ** exp
        expected = tuple(
            ref_u8_cast(min((d + spec) * c, 255.0)) for c in color
        )
        for ch in range(3):
            assert_margin(min((d + spec) * color[ch], 255.0))
        assert tuple(got[i]) == expected, f"fragment {i}: {tuple(got[i])} != {expected}"


def test_specular_zero_exponent_is_one():
    """powf(x, 0) == 1 even for x == 0: the spec term is a flat +0.6."""
    # uv hits texel (3,0): spec byte 0, normal (128,128,255) ~ +z.
    uniforms = {"it_m": IDENTITY4, "t_light_direction": _f32((0.0, 1.0, 0.0))}
    frag = {"uv": _f32([(0.8, 0.1)])}
    got = np.asarray(shaders.shade_specular(frag, uniforms, TEXTURES, CFG, np))

    n = ref_decode_normal((128, 128, 255))
    d = ref_dot((0.0, 1.0, 0.0), n)  # ~ 0.0039: tiny diffuse
    reflected = ref_normalize(
        tuple(2.0 * c * d - l for c, l in zip(n, (0.0, 1.0, 0.0)))
    )
    spec = 0.6 * max(reflected[2], 0.0) ** 0.0  # == 0.6 even if r.z == 0
    assert spec == 0.6
    color = ref_tex_color(TEX, 0.8, 0.1)
    expected = tuple(ref_u8_cast(min((d + spec) * c, 255.0)) for c in color)
    assert tuple(got[0]) == expected


# ---------------------------------------------------------------------------
# darboux: basis solve + tangent-space normal transform (shader.rs:597-654)
# ---------------------------------------------------------------------------


def test_darboux_fixture():
    rows0 = [(1.0, 0.0, 0.0), (1.0, 0.0, 0.0)]
    rows1 = [(0.0, 1.0, 0.0), (0.6, 0.8, 0.0)]  # second basis non-orthogonal
    local_zs = [(0.0, 0.0, 2.0), (0.2, 0.0, 1.0)]  # non-unit: must normalize
    dus = [(0.5, 0.0), (0.2, 0.6)]
    dvs = [(0.0, 0.5), (-0.3, 0.4)]
    uvs = [UVS[0], UVS[1]]

    frag = {
        "uv": _f32(uvs),
        "row0": _f32(rows0),
        "row1": _f32(rows1),
        "local_z": _f32(local_zs),
        "du": _f32(dus),
        "dv": _f32(dvs),
    }
    uniforms = {"t_light_direction": _f32(T_LIGHT)}
    got = np.asarray(shaders.shade_darboux(frag, uniforms, TEXTURES, CFG, np))

    for i in range(2):
        color = ref_tex_color(TEX, *uvs[i])
        tn = ref_decode_normal(ref_tex_color(TANGENT_MAP, *uvs[i]))
        lz = ref_normalize(local_zs[i])
        basis = [list(rows0[i]), list(rows1[i]), list(lz)]
        inv = ref_mat3_inverse(basis)
        lx = ref_normalize(ref_mat3_vec(inv, (dus[i][0], dus[i][1], 0.0)))
        ly = ref_normalize(ref_mat3_vec(inv, (dvs[i][0], dvs[i][1], 0.0)))
        # transform has columns (lx, ly, lz); applied to the tangent sample.
        t_n = ref_normalize(
            tuple(
                lx[c] * tn[0] + ly[c] * tn[1] + lz[c] * tn[2] for c in range(3)
            )
        )
        diff = ref_dot(T_LIGHT, t_n)
        for ch in range(3):
            assert_margin(diff * color[ch])
        expected = ref_color_blend(color, (0, 0, 0), diff)
        assert tuple(got[i]) == expected, f"fragment {i}: {tuple(got[i])} != {expected}"


# ---------------------------------------------------------------------------
# shadow: shadow-map depth compare with round-half-away-from-zero indexing
# and +1.0 z-fighting bias (shader.rs:749-788)
# ---------------------------------------------------------------------------


def _shadow_uniforms(tx):
    shadow = np.array(
        [
            [1.0, 0.0, 0.0, tx],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    return {"shadow_matrix": shadow, "i_vpmv": IDENTITY4}


def test_shadow_fixture():
    cfg = RenderConfig(width=128, height=8)
    buf = np.zeros((8, 128), np.float32)
    buf[2, 3] = 12.0  # fragment 0's shadow texel: 10 + 1 < 12 -> in shadow
    buf[1, 5] = 5.5   # fragment 1: 5 + 1 = 6 >= 5.5 -> lit
    buf[1, 2] = 100.0  # fragment 2: in shadow regardless

    frag = {
        "x": np.array([3, 5, 2], np.int32),
        "y": np.array([2, 1, 1], np.int32),
        "zfrag": _f32([10.0, 5.0, 7.0]),
        "intensity": _f32([0.93, 0.81, 0.67]),
        "uv": _f32(UVS),
        "shadow_buffer": buf,
    }
    got = np.asarray(
        shaders.shade_shadow(frag, _shadow_uniforms(0.4), TEXTURES, cfg, np)
    )

    for i, (x, y, z, t) in enumerate(
        zip([3, 5, 2], [2, 1, 1], [10.0, 5.0, 7.0], [0.93, 0.81, 0.67])
    ):
        sc = ref_mat4_point(
            [[1, 0, 0, 0.4], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            (float(x), float(y), z),
        )
        sx, sy = ref_round(sc[0]), ref_round(sc[1])
        coef = 0.3 if sc[2] + 1.0 < buf[int(sy), int(sx)] else 1.0
        color = ref_tex_color(TEX, *UVS[i])
        for ch in range(3):
            assert_margin(t * coef * color[ch])
        expected = ref_color_blend(color, (0, 0, 0), t * coef)
        assert tuple(got[i]) == expected, f"fragment {i}: {tuple(got[i])} != {expected}"


def test_shadow_rounds_half_away_from_zero():
    """x + 0.5 must round UP (f32::round), not to even (numpy default).
    With translation 0.5, fragment x=2 looks up texel 3, not 2."""
    cfg = RenderConfig(width=128, height=8)
    buf = np.zeros((8, 128), np.float32)
    buf[1, 3] = 100.0  # only correct (away-from-zero) index is in shadow
    buf[1, 2] = 0.0

    frag = {
        "x": np.array([2], np.int32),
        "y": np.array([1], np.int32),
        "zfrag": _f32([7.0]),
        "intensity": _f32([1.0]),
        "uv": _f32([UVS[0]]),
        "shadow_buffer": buf,
    }
    got = np.asarray(
        shaders.shade_shadow(frag, _shadow_uniforms(0.5), TEXTURES, cfg, np)
    )
    color = ref_tex_color(TEX, *UVS[0])
    expected = ref_color_blend(color, (0, 0, 0), 1.0 * 0.3)  # shadowed
    assert tuple(got[0]) == expected


# ---------------------------------------------------------------------------
# occlusion: 16-sample circular shadow-buffer probe (shader.rs:872-947)
# ---------------------------------------------------------------------------


def test_occlusion_fixture():
    cfg = RenderConfig(width=512, height=8)
    # shadow_matrix scales x by 26 so the +-0.02-step samples move off the
    # fragment's shadow texel: x=10 -> texel 260; sample i=4 (sin=1) lands
    # on 261, i=12 (sin=-1) on 259; all others round back to 260.
    S = np.diag([26.0, 1.0, 1.0, 1.0]).astype(np.float32)
    uniforms = {
        "shadow_matrix": S,
        "i_vpmv": IDENTITY4,
        "i_m": IDENTITY4,
        "t_light_direction": _f32((0.0, 0.0, 1.0)),  # rot == identity
    }
    buf = np.full((8, 512), 2.0, np.float32)
    buf[1, 261] = 30.0  # strength min(28/20, 1) = 1
    buf[1, 259] = 12.0  # strength (12-2)/20 = 0.5
    frag = {
        "x": np.array([10], np.int32),
        "y": np.array([1], np.int32),
        "zfrag": _f32([2.0]),
        "shadow_buffer": buf,
    }
    got = np.asarray(shaders.shade_occlusion(frag, uniforms, {}, cfg, np))

    # Independent scalar rerun of shader.rs:916-941.
    fval = 2.0
    occ = 1.0
    for i in range(16):
        ang = 2.0 * math.pi / 16.0 * i
        sample = (10.0 + 0.02 * math.sin(ang), 1.0, 2.0 + 0.02 * math.cos(ang))
        sx = ref_round(sample[0] * 26.0)
        sy = ref_round(sample[1])
        sval = float(buf[int(sy), int(sx)])
        if sval - 1.0 > fval:
            occ -= (1.0 / 16.0) * min((sval - fval) / 20.0, 1.0)
    assert abs(occ - 0.90625) < 1e-9  # hand value: 1 - 1/16 - 0.5/16
    expected = ref_color_blend((255, 255, 255), (0, 0, 0), occ)
    assert expected == (231, 231, 231)
    assert tuple(got[0]) == expected


def test_occlusion_unoccluded_is_white():
    cfg = RenderConfig(width=512, height=8)
    uniforms = {
        "shadow_matrix": IDENTITY4,
        "i_vpmv": IDENTITY4,
        "i_m": IDENTITY4,
        "t_light_direction": _f32((0.0, 0.0, 1.0)),
    }
    buf = np.full((8, 512), 2.0, np.float32)
    frag = {
        "x": np.array([10], np.int32),
        "y": np.array([1], np.int32),
        "zfrag": _f32([2.0]),
        "shadow_buffer": buf,
    }
    got = np.asarray(shaders.shade_occlusion(frag, uniforms, {}, cfg, np))
    assert tuple(got[0]) == (255, 255, 255)
