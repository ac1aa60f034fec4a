"""Math layer unit tests: Rust cast semantics, matrix stack vs hand values."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_renderer_tpu import RenderConfig
from tiny_renderer_tpu.ops import mathlib as ml


class TestCasts:
    def test_f32_to_i32_truncates_toward_zero(self):
        x = np.array([1.9, -1.9, 0.5, -0.5, 2.0, -2.0, 0.0], np.float32)
        np.testing.assert_array_equal(
            ml.rust_f32_to_i32(x, np), [1, -1, 0, 0, 2, -2, 0]
        )

    def test_f32_to_i32_nan_and_saturation(self):
        x = np.array([np.nan, 1e30, -1e30, np.inf, -np.inf], np.float32)
        out = ml.rust_f32_to_i32(x, np)
        assert out[0] == 0
        assert out[1] > 2_000_000_000 and out[2] < -2_000_000_000
        assert out[3] > 2_000_000_000 and out[4] < -2_000_000_000

    def test_f32_to_u8(self):
        x = np.array([-5.0, 0.0, 254.9, 255.0, 300.0, np.nan, 13.7], np.float32)
        np.testing.assert_array_equal(
            ml.rust_f32_to_u8(x, np), [0, 0, 254, 255, 255, 0, 13]
        )

    def test_f32_to_u32(self):
        x = np.array([-5.0, 0.0, 10.9, np.nan], np.float32)
        np.testing.assert_array_equal(ml.rust_f32_to_u32(x, np), [0, 0, 10, 0])

    def test_round_half_away_from_zero(self):
        x = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49, -0.49, 1.2], np.float32)
        np.testing.assert_array_equal(
            ml.rust_round(x, np), [1, 2, 3, -1, -2, -3, 0, 0, 1]
        )

    def test_casts_match_on_jax(self):
        x = np.array([1.9, -1.9, 0.5, -0.5, 255.5, -3.0, np.nan], np.float32)
        np.testing.assert_array_equal(
            np.asarray(ml.rust_f32_to_u8(jnp.asarray(x), jnp)), ml.rust_f32_to_u8(x, np)
        )
        np.testing.assert_array_equal(
            np.asarray(ml.rust_round(jnp.asarray(x[:6]), jnp)), ml.rust_round(x[:6], np)
        )


class TestMatrices:
    def test_mat4_inverse_matches_numpy(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            m = rng.standard_normal((4, 4)).astype(np.float32)
            if abs(np.linalg.det(m.astype(np.float64))) < 1e-3:
                continue
            inv = ml.mat4_inverse(m, np)
            np.testing.assert_allclose(
                inv, np.linalg.inv(m.astype(np.float64)), rtol=2e-3, atol=2e-4
            )

    def test_mat3_inverse_matches_numpy(self):
        rng = np.random.default_rng(4)
        m = rng.standard_normal((5, 3, 3)).astype(np.float32)
        inv = ml.mat3_inverse(m, np)
        np.testing.assert_allclose(
            inv, np.linalg.inv(m.astype(np.float64)), rtol=2e-3, atol=2e-4
        )

    def test_mat4_mul_identity(self):
        rng = np.random.default_rng(5)
        m = rng.standard_normal((4, 4)).astype(np.float32)
        np.testing.assert_array_equal(ml.mat4_mul(np.eye(4, dtype=np.float32), m), m)

    def test_camera_stack_hand_values(self):
        """Camera at +z looking at origin: the stack reduces to viewport *
        projection (model = view-translation only) — verify key entries
        against hand-computed values of shader.rs:183-230."""
        cfg = RenderConfig(width=800, height=800)
        look_from = np.array([0, 0, 1], np.float32)
        look_at = np.zeros(3, np.float32)
        up = np.array([0, 1, 0], np.float32)
        light = np.array([0, 0, 1], np.float32)
        u = ml.default_prepare(cfg, light, look_from, look_at, up, np)

        np.testing.assert_array_equal(u["m"], np.eye(4, dtype=np.float32))
        np.testing.assert_array_equal(u["it_m"], np.eye(4, dtype=np.float32))
        np.testing.assert_array_equal(u["camera_direction"], [0, 0, 1])
        np.testing.assert_array_equal(u["t_light_direction"], [0, 0, 1])

        # vpmv = viewport @ projection @ I @ translate(-look_from).
        # Origin: view -> (0,0,-1,1); projection -> w' = 1 - (-1)/5 = 1.2;
        # viewport (applied before the divide, so its translation scales by
        # w'): x = (w/2)*w' -> x/w' = w/2 = 399.5 exactly; z/w' =
        # (d/2)*(z + w')/w' = 127.5*(1 - 1/1.2).
        p = ml.mat4_transform_point(u["vpmv"], np.zeros(3, np.float32), np)
        w_prime = 1.2
        np.testing.assert_allclose(p[0], 399.5, rtol=1e-6)
        np.testing.assert_allclose(p[1], 399.5, rtol=1e-6)
        np.testing.assert_allclose(p[2], 127.5 * (1.0 - 1.0 / w_prime), rtol=1e-5)

    def test_gram_schmidt_basis_orthonormal(self):
        cfg = RenderConfig()
        rng = np.random.default_rng(7)
        for _ in range(10):
            look_from = rng.standard_normal(3).astype(np.float32)
            up = np.array([0, 1, 0], np.float32)
            u = ml.camera_matrices(
                cfg.width, cfg.height, cfg.depth, cfg.projection_coef,
                look_from, np.zeros(3, np.float32), up, np,
            )
            r = u["m"][:3, :3]
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)

    def test_uniforms_numpy_vs_jax(self, camera):
        """jit compiles mul-add chains to FMA, so jnp uniforms may differ
        from numpy by ~1 ulp (the Rust reference, like numpy, does not fuse);
        anything beyond that tolerance is a real bug."""
        light, look_from, look_at, up = camera
        cfg = RenderConfig()
        u_np = ml.default_prepare(cfg, light, look_from, look_at, up, np)
        u_j = jax.jit(
            lambda l, f, a, uu: ml.default_prepare(cfg, l, f, a, uu, jnp)
        )(light, look_from, look_at, up)
        for k in u_np:
            np.testing.assert_allclose(
                np.asarray(u_j[k]), u_np[k], rtol=3e-7, atol=2e-5, err_msg=k
            )


class TestRotationBetween:
    def test_maps_a_to_b(self):
        rng = np.random.default_rng(11)
        for _ in range(20):
            a = rng.standard_normal(3).astype(np.float32)
            b = rng.standard_normal(3).astype(np.float32)
            r = ml.rotation_between(a, b, np)
            mapped = r @ (a / np.linalg.norm(a))
            np.testing.assert_allclose(mapped, b / np.linalg.norm(b), atol=1e-5)

    def test_identity_when_aligned(self):
        a = np.array([0, 0, 1], np.float32)
        np.testing.assert_allclose(ml.rotation_between(a, a, np), np.eye(3), atol=1e-7)

    def test_opposite_gives_proper_rotation(self):
        a = np.array([0, 0, 1], np.float32)
        r = ml.rotation_between(a, -a, np)
        np.testing.assert_allclose(r @ a, -a, atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(r.astype(np.float64)), 1.0, atol=1e-6)


class TestColorBlend:
    def test_basic(self):
        c1 = np.array([[100, 200, 50]], np.uint8)
        c2 = np.array([[0, 0, 0]], np.uint8)
        out = ml.color_blend(c1, c2, np.array([0.5], np.float32), np)
        np.testing.assert_array_equal(out, [[50, 100, 25]])

    def test_negative_t_saturates_black(self):
        # Negative light intensity -> black via saturating cast (util.rs:7-13).
        c1 = np.array([[100, 200, 50]], np.uint8)
        c2 = np.array([[0, 0, 0]], np.uint8)
        out = ml.color_blend(c1, c2, np.array([-0.5], np.float32), np)
        np.testing.assert_array_equal(out, [[0, 0, 0]])

    def test_unclamped_above_one(self):
        c1 = np.array([[200, 10, 0]], np.uint8)
        c2 = np.array([[0, 100, 0]], np.uint8)
        out = ml.color_blend(c1, c2, np.array([1.5], np.float32), np)
        # 1.5*200 - 0.5*0 = 300 -> 255; 1.5*10 - 0.5*100 = -35 -> 0.
        np.testing.assert_array_equal(out, [[255, 0, 0]])
