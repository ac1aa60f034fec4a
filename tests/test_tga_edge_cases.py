"""Synthetic TGA variants: uncompressed, grayscale, origin bits, 16bpp."""

import struct

import numpy as np
import pytest

from tiny_renderer_tpu.assets.tga import decode_tga
from tiny_renderer_tpu.assets import native


def _header(img_type, w, h, bpp, desc=0):
    return struct.pack("<BBBHHBHHHHBB", 0, 0, img_type, 0, 0, 0, 0, 0, w, h, bpp, desc)


def _rle_encode(pixels, bpp_bytes):
    """Simple RLE: alternate raw and run packets."""
    out = bytearray()
    i = 0
    n = len(pixels) // bpp_bytes
    while i < n:
        px = pixels[i * bpp_bytes : (i + 1) * bpp_bytes]
        run = 1
        while i + run < n and run < 128 and pixels[(i + run) * bpp_bytes : (i + run + 1) * bpp_bytes] == px:
            run += 1
        if run > 1:
            out.append(0x80 | (run - 1))
            out += px
        else:
            out.append(0)
            out += px
        i += run
    return bytes(out)


def _rand_rgb(seed, h, w):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_uncompressed_truecolor_bottom_origin():
    img = _rand_rgb(0, 8, 8)
    bgr = img[::-1][:, :, ::-1]  # stored bottom-up, BGR
    buf = _header(2, 8, 8, 24, desc=0) + bgr.tobytes()
    np.testing.assert_array_equal(decode_tga(buf), img)


def test_uncompressed_top_origin():
    img = _rand_rgb(1, 4, 6)
    buf = _header(2, 6, 4, 24, desc=0x20) + img[:, :, ::-1].tobytes()
    np.testing.assert_array_equal(decode_tga(buf), img)


def test_uncompressed_grayscale():
    g = np.random.default_rng(2).integers(0, 256, (5, 7), dtype=np.uint8)
    buf = _header(3, 7, 5, 8, desc=0x20) + g.tobytes()
    np.testing.assert_array_equal(decode_tga(buf), np.repeat(g[..., None], 3, axis=2))


def test_rle_truecolor_roundtrip():
    img = _rand_rgb(3, 16, 16)
    img[:8] = img[0, 0]  # long runs to exercise RLE packets
    bgr = img[:, :, ::-1].tobytes()
    buf = _header(10, 16, 16, 24, desc=0x20) + _rle_encode(bgr, 3)
    np.testing.assert_array_equal(decode_tga(buf), img)


def test_rle_32bpp_alpha_dropped():
    img = _rand_rgb(4, 8, 8)
    bgra = np.concatenate([img[:, :, ::-1], np.full((8, 8, 1), 99, np.uint8)], axis=2)
    buf = _header(10, 8, 8, 32, desc=0x20 | 0x08) + _rle_encode(bgra.tobytes(), 4)
    np.testing.assert_array_equal(decode_tga(buf), img)


def test_right_to_left_origin():
    img = _rand_rgb(5, 4, 4)
    buf = _header(2, 4, 4, 24, desc=0x20 | 0x10) + img[:, ::-1, ::-1].tobytes()
    np.testing.assert_array_equal(decode_tga(buf), img)


def test_16bpp_channels():
    # one pixel: r=31 g=0 b=15 -> A1RRRRRGG GGGBBBBB little endian
    v = (31 << 10) | (0 << 5) | 15
    buf = _header(2, 1, 1, 16, desc=0x20) + struct.pack("<H", v)
    out = decode_tga(buf)
    assert out.shape == (1, 1, 3)
    assert out[0, 0, 0] == 255 and out[0, 0, 1] == 0 and out[0, 0, 2] == round(15 * 255 / 31)


def test_native_matches_numpy_on_synthetic(tmp_path):
    if not native.native_available():
        pytest.skip("native loader not built")
    img = _rand_rgb(6, 12, 10)
    bgr = img[::-1][:, :, ::-1].tobytes()
    buf = _header(10, 10, 12, 24, desc=0) + _rle_encode(bgr, 3)
    p = str(tmp_path / "x.tga")
    with open(p, "wb") as f:
        f.write(buf)
    np.testing.assert_array_equal(native.read_tga_native(p), decode_tga(buf))


def test_truncated_file_raises():
    with pytest.raises(ValueError):
        decode_tga(b"\x00\x00")
