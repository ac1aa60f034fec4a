"""Custom-pipeline registration (register_pipeline / unregister_pipeline).

A registered pipeline must behave exactly like a built-in: same frame on
the jnp and Pallas backends, oracle parity for free (the oracle reads
the same tables), shadow pre-pass plumbed when two_pass, and the
strip-compacted shade path engaged.  Validation must reject typos
loudly — a silently-garbage render is the failure mode to prevent.
"""

import numpy as np
import pytest

from tiny_renderer_tpu.config import RenderConfig
from tiny_renderer_tpu.oracle import render_oracle
from tiny_renderer_tpu.pipelines import shaders
from tiny_renderer_tpu.pipelines.frame import (
    PIPELINES,
    make_frame_fn,
    register_pipeline,
    unregister_pipeline,
)

from conftest import geom_dict, tex_dict


def shade_toon(frag, uniforms, textures, config, xp):
    from tiny_renderer_tpu.ops import mathlib as ml

    color = shaders.sample_frag(textures, frag, ("texture",), xp)["texture"]
    bands = xp.float32(4.0)
    t = xp.ceil(xp.clip(frag["intensity"], 0.0, 1.0) * bands) / bands
    return ml.color_blend(color, xp.asarray(shaders.BLACK), t, xp)


def shade_depth_fog(frag, uniforms, textures, config, xp):
    """two_pass custom shade: phong dimmed by the shadow compare, tinted
    by zfrag — exercises shadow_buffer plumbing + zfrag varying."""
    from tiny_renderer_tpu.ops import mathlib as ml

    sm = ml.mat4_mul(uniforms["shadow_matrix"], uniforms["i_vpmv"])
    p = xp.stack(
        [frag["x"].astype(xp.float32), frag["y"].astype(xp.float32),
         frag["zfrag"]], axis=-1,
    )
    sc = ml.mat4_transform_point(sm, p, xp)
    sval = shaders._shadow_fetch(
        frag["shadow_buffer"], sc[..., 0], sc[..., 1], config.width, xp,
        tile=shaders.plane_tile_effective(config, frag["shadow_buffer"].shape),
    )
    lit = xp.where(
        sc[..., 2] + xp.float32(config.shadow_bias) < sval,
        xp.float32(0.3), xp.float32(1.0),
    )
    t = lit * xp.clip(frag["zfrag"] / xp.float32(config.depth), 0.0, 1.0)
    color = shaders.sample_frag(textures, frag, ("texture",), xp)["texture"]
    return ml.color_blend(color, xp.asarray(shaders.BLACK), t, xp)


@pytest.fixture
def toon():
    register_pipeline(
        "toon", shade_toon,
        varying_spec=(("uv", 2, "interp"), ("intensity", 1, "interp")),
        maps=("texture",), needs=("vertex_intensity",),
    )
    yield "toon"
    unregister_pipeline("toon")


@pytest.fixture
def fog():
    register_pipeline(
        "fog", shade_depth_fog,
        varying_spec=(("uv", 2, "interp"), ("zfrag", 1, "zfrag")),
        maps=("texture",), two_pass=True,
    )
    yield "fog"
    unregister_pipeline("fog")


def shade_heat(frag, uniforms, textures, config, xp):
    """Custom-attribute shade: texture dimmed by a user-supplied scalar
    per-vertex 'heat' plane (register_pipeline 'attr:*' extension)."""
    from tiny_renderer_tpu.ops import mathlib as ml

    color = shaders.sample_frag(textures, frag, ("texture",), xp)["texture"]
    t = xp.clip(frag["attr:heat"][..., 0], 0.0, 1.0)
    return ml.color_blend(color, xp.asarray(shaders.BLACK), t, xp)


@pytest.fixture
def heat():
    register_pipeline(
        "heat", shade_heat,
        varying_spec=(("uv", 2, "interp"), ("attr:heat", 1, "interp")),
        maps=("texture",),
    )
    yield "heat"
    unregister_pipeline("heat")


@pytest.fixture(scope="module")
def scene(head_model):
    return geom_dict(head_model.mesh), tex_dict(head_model)


@pytest.fixture(scope="module")
def heat_scene(head_model):
    geom = dict(geom_dict(head_model.mesh))
    # Smooth position-derived per-corner values: neighboring triangles
    # agree at shared vertices, so the kernel's usual z-ULP tie-flip
    # pixels shade near-identically (as with the built-in varyings) and
    # the backend-parity assertions keep their standard budgets.  A
    # random-valued plane would light up EVERY tie-flip as a full-color
    # mismatch.
    corners = np.asarray(geom["positions"])[np.asarray(geom["pos_idx"])]
    heat = 0.5 + 0.5 * np.sin(4.0 * corners[..., 0] + 2.0 * corners[..., 1])
    geom["attr:heat"] = heat[..., None].astype(np.float32)
    return geom, tex_dict(head_model)


def _render(pipeline, scene, camera, backend, **cfg_kw):
    import jax
    import jax.numpy as jnp

    geom, tex = scene
    cfg = RenderConfig(width=96, height=96, strip_batch=32, tile_h=8, **cfg_kw)
    fn = make_frame_fn(pipeline, cfg, backend=backend)
    out = fn(
        jax.tree.map(jnp.asarray, geom), jax.tree.map(jnp.asarray, tex),
        *map(jnp.asarray, camera),
    )
    return np.asarray(out["frame"])


# fog is the fast rep (more varyings + texture fetch); toon mirrors the
# same registry path and runs in -m slow.
@pytest.mark.parametrize("pipe_fixture", [
    pytest.param("toon", marks=pytest.mark.slow), "fog",
])
def test_custom_pipeline_backends_and_oracle(pipe_fixture, scene, camera,
                                             request):
    pipeline = request.getfixturevalue(pipe_fixture)
    geom, tex = scene
    jnp_frame = _render(pipeline, scene, camera, "jnp")
    # Rendered something non-trivial.
    assert (jnp_frame.any(axis=-1)).mean() > 0.05
    # Pallas kernel path (strip-compacted shade) agrees bit-for-bit up to
    # the usual tie-flip budget vs the jnp raster; interpret mode runs the
    # real kernel on CPU.
    pl_frame = _render(pipeline, scene, camera, "pallas_interpret")
    mismatch = (pl_frame != jnp_frame).any(axis=-1).mean()
    assert mismatch <= 0.005, f"jnp vs pallas mismatch {mismatch:.4%}"
    # The oracle renders the custom pipeline through the SAME tables.
    cfg = RenderConfig(width=96, height=96, strip_batch=32, tile_h=8)
    o = render_oracle(
        {k: np.asarray(v) for k, v in geom.items()},
        {k: np.asarray(v) for k, v in tex.items()},
        *camera, pipeline=pipeline, config=cfg,
    )
    mismatch = (o["frame"] != jnp_frame).any(axis=-1).mean()
    assert mismatch <= 0.005, f"oracle mismatch {mismatch:.4%}"


def test_custom_attr_backends_and_oracle(heat, heat_scene, camera):
    """A user vertex attribute ('attr:heat') interpolates identically on
    the jnp path, the real kernel's strip-compacted shade, and the CPU
    oracle — the (T,3,k) plane rides the packed fragment gather."""
    geom, tex = heat_scene
    jnp_frame = _render(heat, heat_scene, camera, "jnp")
    assert (jnp_frame.any(axis=-1)).mean() > 0.05
    pl_frame = _render(heat, heat_scene, camera, "pallas_interpret")
    mismatch = (pl_frame != jnp_frame).any(axis=-1).mean()
    assert mismatch <= 0.005, f"jnp vs pallas mismatch {mismatch:.4%}"
    cfg = RenderConfig(width=96, height=96, strip_batch=32, tile_h=8)
    o = render_oracle(
        {k: np.asarray(v) for k, v in geom.items()},
        {k: np.asarray(v) for k, v in tex.items()},
        *camera, pipeline=heat, config=cfg,
    )
    mismatch = (o["frame"] != jnp_frame).any(axis=-1).mean()
    assert mismatch <= 0.005, f"oracle mismatch {mismatch:.4%}"
    # The attribute must actually shape the output: zeroed heat differs.
    cold = dict(geom)
    cold["attr:heat"] = np.zeros_like(np.asarray(geom["attr:heat"]))
    cold_frame = _render(heat, (cold, tex), camera, "jnp")
    assert not np.array_equal(cold_frame, jnp_frame)


def test_custom_attr_burst(heat, heat_scene):
    """The attribute plane rides the burst (lax.scan) path unchanged."""
    import jax
    import jax.numpy as jnp

    from tiny_renderer_tpu.pipelines.frame import make_burst_fn

    geom, tex = heat_scene
    cfg = RenderConfig(width=64, height=64, strip_batch=32, tile_h=8)
    burst = make_burst_fn(heat, cfg, backend="jnp", keep_frames=True)
    cam = jnp.asarray(np.linspace(0.0, 0.5, 3, dtype=np.float32))
    lig = jnp.asarray(np.linspace(-0.4, 0.1, 3, dtype=np.float32))
    out = burst(
        jax.tree.map(jnp.asarray, geom), jax.tree.map(jnp.asarray, tex),
        cam, lig,
    )
    frames = np.asarray(out["frames"])
    assert frames.shape == (3, 64, 64, 3)
    assert frames.any() and not np.array_equal(frames[0], frames[2])
    assert not np.asarray(out["overflow"]).any()


def test_custom_attr_missing_raises(heat, scene, camera):
    with pytest.raises(ValueError, match="attr:heat"):
        _render(heat, scene, camera, "jnp")


def test_custom_attr_bad_shape_raises(heat, heat_scene, camera):
    geom, tex = heat_scene
    bad = dict(geom)
    bad["attr:heat"] = np.zeros((7, 3, 1), np.float32)
    with pytest.raises(ValueError, match="num_triangles"):
        _render(heat, (bad, tex), camera, "jnp")


def test_custom_attr_validation():
    with pytest.raises(ValueError, match="interp"):
        register_pipeline("bad", shade_heat,
                          varying_spec=(("attr:x", 1, "const"),))
    for comps in (0, 9, "x"):
        with pytest.raises(ValueError, match="components"):
            register_pipeline("bad", shade_heat,
                              varying_spec=(("attr:x", comps, "interp"),))
    assert "bad" not in PIPELINES


def test_custom_attr_sharded(heat, heat_scene, camera, eight_devices):
    """The (T,3,k) attribute plane shards over the triangle axis with the
    rest of the vertex stage (shard_triangles) and row-shards bit-equal."""
    import jax
    import jax.numpy as jnp

    from tiny_renderer_tpu.parallel.sharding import (
        make_row_mesh,
        render_frame_sharded,
    )

    geom, tex = heat_scene
    cfg = RenderConfig(width=96, height=96, strip_batch=32, tile_h=8,
                       shard_triangles=True)
    args = (
        jax.tree.map(jnp.asarray, geom), jax.tree.map(jnp.asarray, tex),
        *map(jnp.asarray, camera),
    )
    mesh = make_row_mesh(eight_devices, batch=1)
    sharded = render_frame_sharded(*args, pipeline=heat, config=cfg,
                                   mesh=mesh, backend="jnp")
    single = make_frame_fn(heat, cfg, backend="jnp")(*args)
    np.testing.assert_array_equal(
        np.asarray(sharded["frame"]), np.asarray(single["frame"])
    )


@pytest.mark.slow  # built-in swizzle pins run fast in test_tex_swizzle
def test_custom_pipeline_swizzle_knobs(toon, scene, camera):
    base = _render(toon, scene, camera, "pallas_interpret")
    knobbed = _render(toon, scene, camera, "pallas_interpret",
                      tex_tile=16, shadow_tile=16)
    np.testing.assert_array_equal(base, knobbed)


def test_registration_validation(toon):
    with pytest.raises(ValueError, match="already registered"):
        register_pipeline("toon", shade_toon, varying_spec=())
    with pytest.raises(ValueError, match="unknown varying"):
        register_pipeline("bad", shade_toon,
                          varying_spec=(("wobble", 1, "interp"),))
    with pytest.raises(ValueError, match="mode"):
        register_pipeline("bad", shade_toon,
                          varying_spec=(("uv", 2, "zfrag"),))
    with pytest.raises(ValueError, match="unknown vertex-stage need"):
        register_pipeline("bad", shade_toon, varying_spec=(),
                          needs=("sparkles",))
    with pytest.raises(ValueError, match="intensity"):
        register_pipeline("bad", shade_toon,
                          varying_spec=(("intensity", 1, "interp"),))
    with pytest.raises(ValueError, match="darboux"):
        register_pipeline("bad", shade_toon,
                          varying_spec=(("local_z", 3, "interp"),))
    assert "bad" not in PIPELINES
    with pytest.raises(ValueError, match="built-in"):
        unregister_pipeline("shadow")


def test_registration_rejects_wrong_component_count():
    # A wrong comps value would misalign every later varying's plane /
    # record lanes — silently-garbage pixels, the exact failure mode the
    # validation exists to prevent.
    with pytest.raises(ValueError, match="components"):
        register_pipeline("bad", shade_toon,
                          varying_spec=(("uv", 3, "interp"),))
    with pytest.raises(ValueError, match="components"):
        register_pipeline("bad", shade_toon,
                          varying_spec=(("zfrag", 2, "zfrag"),))
    assert "bad" not in PIPELINES


def test_overwrite_invalidates_jit_cache(scene, camera):
    """register_pipeline(overwrite=True) must not serve renders compiled
    against the OLD shade: the jit caches are keyed on the pipeline NAME
    alone, so re-registration has to invalidate them."""

    def shade_red(frag, uniforms, textures, config, xp):
        rgb = xp.zeros(frag["intensity"].shape + (3,), xp.uint8)
        return rgb.at[..., 0].set(200) if xp is not np else _np_set(rgb)

    def _np_set(rgb):
        rgb[..., 0] = 200
        return rgb

    def shade_green(frag, uniforms, textures, config, xp):
        rgb = xp.zeros(frag["intensity"].shape + (3,), xp.uint8)
        return rgb.at[..., 1].set(200) if xp is not np else _np_set_g(rgb)

    def _np_set_g(rgb):
        rgb[..., 1] = 200
        return rgb

    spec = (("intensity", 1, "interp"),)
    register_pipeline("swap", shade_red, varying_spec=spec,
                      needs=("vertex_intensity",))
    try:
        red = _render("swap", scene, camera, "jnp")
        assert (red[..., 0] == 200).any() and not (red[..., 1] == 200).any()
        register_pipeline("swap", shade_green, varying_spec=spec,
                          needs=("vertex_intensity",), overwrite=True)
        green = _render("swap", scene, camera, "jnp")
        assert (green[..., 1] == 200).any(), \
            "stale jit cache served the old shade after overwrite=True"
        assert not (green[..., 0] == 200).any()
    finally:
        unregister_pipeline("swap")


def test_reregister_after_unregister_not_stale(scene, camera):
    """unregister -> register of the SAME name must not serve executables
    traced against the removed shade (the registration-generation key
    bumps at unregister; a fresh register of an absent name does not)."""
    def shade_a(frag, uniforms, textures, config, xp):
        rgb = np.zeros(frag["intensity"].shape + (3,), np.uint8) if xp is np \
            else xp.zeros(frag["intensity"].shape + (3,), xp.uint8)
        if xp is np:
            rgb[..., 0] = 10
            return rgb
        return rgb.at[..., 0].set(10)

    def shade_b(frag, uniforms, textures, config, xp):
        rgb = np.zeros(frag["intensity"].shape + (3,), np.uint8) if xp is np \
            else xp.zeros(frag["intensity"].shape + (3,), xp.uint8)
        if xp is np:
            rgb[..., 0] = 77
            return rgb
        return rgb.at[..., 0].set(77)

    spec = (("intensity", 1, "interp"),)
    register_pipeline("regen", shade_a, varying_spec=spec,
                      needs=("vertex_intensity",))
    try:
        a = _render("regen", scene, camera, "jnp")
        assert (a[..., 0] == 10).any()
        unregister_pipeline("regen")
        register_pipeline("regen", shade_b, varying_spec=spec,
                          needs=("vertex_intensity",))
        b = _render("regen", scene, camera, "jnp")
        assert (b[..., 0] == 77).any(), "stale executable after re-register"
        assert not (b[..., 0] == 10).any()
    finally:
        unregister_pipeline("regen")


def test_unregister_cleans_all_tables():
    from tiny_renderer_tpu.pipelines.frame import _GATHER_KEYS, _PIPELINE_MAPS

    register_pipeline("tmp", shade_toon,
                      varying_spec=(("uv", 2, "interp"),), maps=("texture",))
    assert "tmp" in PIPELINES and "tmp" in shaders.VARYING_SPECS
    unregister_pipeline("tmp")
    for table in (PIPELINES, shaders.VARYING_SPECS, _PIPELINE_MAPS,
                  shaders._PIPELINE_MAPS_FOR_SPEC, _GATHER_KEYS):
        assert "tmp" not in table
    unregister_pipeline("tmp")  # idempotent


def test_scene_and_cli_see_registered_pipeline(toon, head_model):
    from tiny_renderer_tpu.app import build_arg_parser
    from tiny_renderer_tpu.scene import Scene

    cfg = RenderConfig(width=64, height=64, strip_batch=32, tile_h=8)
    s = Scene(head_model, toon, cfg, backend="jnp")
    s.render()
    assert s.get_frame_buffer().shape == (64, 64, 3)
    args, _ = build_arg_parser().parse_known_args(["-s", "toon"])
    assert args.pipeline == "toon"


def test_example_module_registers(tmp_path, monkeypatch):
    """The shipped example registers and shades through the real pipeline
    (main() is exercised at small size via its shade function here; the
    full-size script is the user-facing path)."""
    import importlib.util
    import os
    import sys

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "custom_pipeline.py")
    spec = importlib.util.spec_from_file_location("example_custom", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    register_pipeline(
        "toon_ex", mod.shade_toon,
        varying_spec=(("uv", 2, "interp"), ("intensity", 1, "interp")),
        maps=("texture",), needs=("vertex_intensity",),
    )
    register_pipeline(
        "glow_ex", mod.shade_glow,
        varying_spec=(("uv", 2, "interp"), ("attr:glow", 1, "interp")),
        maps=("texture",),
    )
    try:
        assert "toon_ex" in PIPELINES and "glow_ex" in PIPELINES
    finally:
        unregister_pipeline("toon_ex")
        unregister_pipeline("glow_ex")


def test_scene_vertex_attrs(heat, head_model):
    """Scene(vertex_attrs=...) threads a user attribute through the
    Model-level API (the example's posture)."""
    from tiny_renderer_tpu import Scene

    mesh = head_model.mesh
    corners = np.asarray(mesh.positions)[np.asarray(mesh.pos_idx)]
    vals = (0.5 + 0.5 * np.sin(3.0 * corners[..., 0]))[..., None].astype(
        np.float32)
    sc = Scene(head_model, heat,
               RenderConfig(width=96, height=96, strip_batch=32, tile_h=8),
               backend="jnp", vertex_attrs={"heat": vals})
    sc.render()
    frame = sc.get_frame_buffer()
    assert (frame.any(axis=-1)).mean() > 0.05


@pytest.fixture(scope="module")
def eight_devices():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


@pytest.mark.parametrize("pipe_fixture", [
    pytest.param("toon", marks=pytest.mark.slow), "fog",
])
def test_custom_pipeline_sharded(pipe_fixture, scene, camera, eight_devices,
                                 request):
    """Row-sharded rendering of a REGISTERED pipeline is bit-identical to
    single-device — the sharded path reads the same live tables."""
    import jax
    import jax.numpy as jnp

    from tiny_renderer_tpu.parallel.sharding import (
        make_row_mesh,
        render_frame_sharded,
    )

    pipeline = request.getfixturevalue(pipe_fixture)
    geom, tex = scene
    cfg = RenderConfig(width=96, height=96, strip_batch=32, tile_h=8)
    args = (
        jax.tree.map(jnp.asarray, geom), jax.tree.map(jnp.asarray, tex),
        *map(jnp.asarray, camera),
    )
    mesh = make_row_mesh(eight_devices, batch=1)
    sharded = render_frame_sharded(*args, pipeline=pipeline, config=cfg,
                                   mesh=mesh)
    single = make_frame_fn(pipeline, cfg, backend="jnp")(*args)
    np.testing.assert_array_equal(
        np.asarray(sharded["frame"]), np.asarray(single["frame"])
    )
