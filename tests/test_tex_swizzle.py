"""Tile-swizzled texture layout (config.tex_tile).

The swizzle is a pure permutation of the packed texture plane plus the
matching index transform — outputs must be bit-identical with it on or
off (the knob matrix and fuzz draws pin that end-to-end through the
kernel).  These tests pin the layout machinery itself: the index map is
a bijection consistent with pack_textures' reordering, the samplers
decode identically under both layouts, kernel_varying_spec advertises
the layout to the Pallas kernel, and mismatched prepacks are redone.
"""

import numpy as np
import pytest

from tiny_renderer_tpu.pipelines import shaders
from tiny_renderer_tpu.pipelines.frame import _pk_needed, prepack_textures


def _textures(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "texture": rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
        "normal_map": rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
        "normal_map_tangent": rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
        "specular_map": rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
    }


@pytest.mark.parametrize("tile", [8, 16, 32])
def test_swizzle_index_is_the_pack_permutation(tile):
    """_swizzle_index must be a bijection on [0, h*w) AND agree with the
    reordering pack_textures applies: fetching the swizzled plane at the
    swizzled index returns the texel at (y, x)."""
    h = w = 64
    ys, xs = np.mgrid[0:h, 0:w]
    idx = shaders._swizzle_index(xs, ys, w, tile, np)
    assert sorted(idx.ravel().tolist()) == list(range(h * w))

    tex = _textures(h, w)
    packed = shaders.pack_textures(tex, ("texture",), np, tile=tile)
    plain = shaders.pack_textures(tex, ("texture",), np)
    pk_s = packed[shaders._pk_key(("texture",), tile)].reshape(-1, 1)
    pk_p = plain[shaders._pk_key(("texture",))]
    np.testing.assert_array_equal(pk_s[idx, 0], pk_p[ys, xs, 0])


@pytest.mark.parametrize("names", [("texture",),
                                   ("texture", "normal_map", "specular_map")])
def test_sample_maps_identical_under_swizzle(names):
    tex = _textures()
    rng = np.random.default_rng(3)
    uv = rng.uniform(-0.2, 1.2, size=(257, 2)).astype(np.float32)
    plain = shaders.sample_maps(
        shaders.pack_textures(tex, names, np), uv, names, np
    )
    swz = shaders.sample_maps(
        shaders.pack_textures(tex, names, np, tile=16), uv, names, np
    )
    for n in names:
        np.testing.assert_array_equal(plain[n], swz[n])


def test_kernel_spec_advertises_tile():
    tex = _textures()
    spec = shaders.kernel_varying_spec("shadow", tex, tile=16)
    modes = [m for (_, _, m) in spec if m.startswith("texidx")]
    assert modes == ["texidx:64:64:16"]
    # Non-divisible tile falls back to the row-major 3-part mode...
    spec = shaders.kernel_varying_spec("shadow", _textures(h=48, w=48), tile=32)
    modes = [m for (_, _, m) in spec if m.startswith("texidx")]
    assert modes == ["texidx:48:48"]
    # ...and pack_textures makes the SAME fallback decision.
    packed = shaders.pack_textures(_textures(h=48, w=48), ("texture",), np,
                                   tile=32)
    assert shaders._pk_key(("texture",)) in packed


def test_mismatched_prepack_is_redone():
    """A plane packed in one layout must be repacked when the config asks
    for another — the samplers read the layout from the key."""
    tex = _textures()
    plain = prepack_textures(tex, "shadow", np)
    assert not _pk_needed(plain, "shadow", 0)
    assert _pk_needed(plain, "shadow", 16)
    swz = prepack_textures(tex, "shadow", np, tile=16)
    assert not _pk_needed(swz, "shadow", 16)
    assert _pk_needed(swz, "shadow", 0)
    # Repacking replaces the stale variant: exactly one plane remains.
    repacked = prepack_textures(swz, "shadow", np, tile=0)
    keys = [k for k in repacked if k.startswith("_pk:")]
    assert keys == [shaders._pk_key(("texture",))]


def test_tex_tile_validation():
    from tiny_renderer_tpu.config import RenderConfig

    RenderConfig(tex_tile=0)
    RenderConfig(tex_tile=16)
    with pytest.raises(ValueError):
        RenderConfig(tex_tile=12)
    with pytest.raises(ValueError):
        RenderConfig(tex_tile=-8)
    RenderConfig(shadow_tile=8)
    with pytest.raises(ValueError):
        RenderConfig(shadow_tile=24)


# ---------------------------------------------------------------------------
# shadow_tile: the same swizzle applied to the shade's shadow-map copy.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("tile", [8, 16])
def test_shadow_fetch_identical_under_swizzle(tile):
    """_shadow_fetch from the swizzled plane with the transformed indices
    must be bit-identical to the row-major fetch — including the
    reference's quirk coords: negatives (u32-saturated to 0), x beyond
    width (the FLAT index wraps into the next row), and coords past the
    buffer end (flat clamp to size-1)."""
    h = w = 64
    rng = np.random.default_rng(7)
    plane = rng.standard_normal((h, w)).astype(np.float32)
    sx = rng.uniform(-20, w + 20, size=(513,)).astype(np.float32)
    sy = rng.uniform(-20, h + 20, size=(513,)).astype(np.float32)
    plain = shaders._shadow_fetch(plane, sx, sy, w, np)
    swz = shaders._shadow_fetch(
        shaders.swizzle_plane(plane, tile, np), sx, sy, w, np, tile=tile
    )
    np.testing.assert_array_equal(plain, swz)


def test_plane_tile_effective_contract():
    from tiny_renderer_tpu.config import RenderConfig

    cfg = RenderConfig(width=64, height=64, shadow_tile=16)
    assert shaders.plane_tile_effective(cfg, (64, 64)) == 16
    # Stride mismatch (padded buffer) or non-divisible dims: fallback.
    assert shaders.plane_tile_effective(cfg, (64, 128)) == 0
    cfg = RenderConfig(width=72, height=72, shadow_tile=16)
    assert shaders.plane_tile_effective(cfg, (72, 72)) == 0


@pytest.fixture(scope="module")
def _head_scene(head_model):
    from conftest import geom_dict, tex_dict

    return geom_dict(head_model.mesh), tex_dict(head_model)


@pytest.mark.parametrize("pipeline", [
    "shadow", pytest.param("occlusion", marks=pytest.mark.slow),
])
def test_shadow_tile_render_bit_identical(pipeline, _head_scene, camera):
    """End-to-end: shadow_tile on/off renders the exact same frame through
    the real two-pass path (occlusion exercises the 17-probe loop and its
    dedup_gather composition on permuted indices)."""
    import dataclasses

    from tiny_renderer_tpu.config import RenderConfig
    from tiny_renderer_tpu.pipelines.frame import render_frame

    head_geom, head_tex = _head_scene
    base = RenderConfig(width=64, height=64, strip_batch=32, tile_h=8)
    ref = render_frame(
        head_geom, head_tex, *camera, pipeline=pipeline, config=base,
        backend="jnp",
    )
    for cfg in (
        dataclasses.replace(base, shadow_tile=16),
        dataclasses.replace(base, shadow_tile=16, occlusion_dedup=True),
    ):
        out = render_frame(
            head_geom, head_tex, *camera, pipeline=pipeline, config=cfg,
            backend="jnp",
        )
        np.testing.assert_array_equal(
            np.asarray(out["frame"]), np.asarray(ref["frame"])
        )
        # The returned (host-facing) shadow map stays row-major.
        np.testing.assert_array_equal(
            np.asarray(out["shadow"]), np.asarray(ref["shadow"])
        )


@pytest.mark.parametrize("pipeline", ["specular", "darboux"])
def test_tex_tile_multimap_kernel_bit_identical(pipeline, _head_scene, camera):
    """The kernel texidx swizzle mode with MULTI-map packed planes
    (specular: 3 words/texel, darboux: 2 + tangent-dims quirk) through
    the real Pallas kernel (interpret) — the knob matrix covers only the
    single-map shadow pipeline."""
    import dataclasses

    from tiny_renderer_tpu.config import RenderConfig
    from tiny_renderer_tpu.pipelines.frame import render_frame

    head_geom, head_tex = _head_scene
    base = RenderConfig(width=64, height=64, strip_batch=32, tile_h=8)
    ref = render_frame(
        head_geom, head_tex, *camera, pipeline=pipeline, config=base,
        backend="pallas_interpret", needs_z=False,
    )
    out = render_frame(
        head_geom, head_tex, *camera, pipeline=pipeline,
        config=dataclasses.replace(base, tex_tile=16),
        backend="pallas_interpret", needs_z=False,
    )
    np.testing.assert_array_equal(
        np.asarray(out["frame"]), np.asarray(ref["frame"])
    )
