"""Radiance .hdr parser tests: RLE + flat encodings, native-vs-Python parity
(scene/envmap.py, csrc/hdr_rle.cpp; reference parser scene.cu:40-184)."""

import numpy as np
import pytest

from neural_renderer_tpu.scene import envmap as em


def _rgbe_image(rng, h, w):
    """Random RGBE bytes with runs (so RLE paths are exercised)."""
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    img[:, : w // 3] = img[:, :1]          # long horizontal runs per row
    img[:, :, 3] = np.maximum(img[:, :, 3], 1)  # nonzero exponents
    return img


def _write_hdr_rle(path, rgbe):
    """Encode with the standard adaptive RLE scanline format."""
    h, w = rgbe.shape[:2]
    out = bytearray(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
    out += f"-Y {h} +X {w}\n".encode()
    for y in range(h):
        out += bytes([2, 2, (w >> 8) & 0x7F, w & 0xFF])
        for c in range(4):
            row = rgbe[y, :, c]
            x = 0
            while x < w:
                # Find a repeat run.
                run = 1
                while x + run < w and run < 127 and row[x + run] == row[x]:
                    run += 1
                if run >= 4:
                    out += bytes([128 + run, int(row[x])])
                    x += run
                else:
                    # Literal run up to the next long repeat (or 128).
                    lit_end = x
                    while lit_end < w and lit_end - x < 128:
                        r = 1
                        while (lit_end + r < w and r < 4
                               and row[lit_end + r] == row[lit_end]):
                            r += 1
                        if r >= 4:
                            break
                        lit_end += 1
                    lit_end = max(lit_end, x + 1)
                    n = lit_end - x
                    out += bytes([n]) + row[x:lit_end].tobytes()
                    x = lit_end
    path.write_bytes(bytes(out))


def _write_hdr_flat(path, rgbe):
    h, w = rgbe.shape[:2]
    out = bytearray(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
    out += f"-Y {h} +X {w}\n".encode()
    out += rgbe.tobytes()
    path.write_bytes(bytes(out))


def test_hdr_rle_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    rgbe = _rgbe_image(rng, 6, 32)
    p = tmp_path / "a.hdr"
    _write_hdr_rle(p, rgbe)
    img = em.load_hdr(str(p))
    assert img.shape == (6, 32, 3)
    np.testing.assert_array_equal(
        img, em.decode_rgbe(rgbe.reshape(-1, 4)).reshape(6, 32, 3))


def test_hdr_native_matches_python(tmp_path, monkeypatch):
    """The C++ RLE decoder and the Python loop must agree byte-for-byte."""
    rng = np.random.default_rng(4)
    rgbe = _rgbe_image(rng, 5, 48)
    p = tmp_path / "b.hdr"
    _write_hdr_rle(p, rgbe)

    # Confirm the native library actually loads in this environment
    # (otherwise the comparison below is Python-vs-Python).
    assert em._load_rle_native() is not None
    native = em.load_hdr(str(p))
    # Force the Python path.
    monkeypatch.setattr(em, "_load_rle_native", lambda: None)
    python = em.load_hdr(str(p))
    np.testing.assert_array_equal(native, python)


def test_hdr_flat_fallback(tmp_path):
    """Non-RLE (flat) files skip the native path and decode correctly."""
    rng = np.random.default_rng(5)
    rgbe = _rgbe_image(rng, 4, 16)
    p = tmp_path / "c.hdr"
    _write_hdr_flat(p, rgbe)
    img = em.load_hdr(str(p))
    np.testing.assert_array_equal(
        img, em.decode_rgbe(rgbe.reshape(-1, 4)).reshape(4, 16, 3))


def test_hdr_truncated_raises(tmp_path):
    rng = np.random.default_rng(6)
    rgbe = _rgbe_image(rng, 4, 32)
    p = tmp_path / "d.hdr"
    _write_hdr_rle(p, rgbe)
    data = p.read_bytes()
    p.write_bytes(data[: len(data) - 20])
    with pytest.raises(em.EnvmapLoadError):
        em.load_hdr(str(p))


def test_hdr_bad_format_raises(tmp_path):
    p = tmp_path / "e.hdr"
    p.write_bytes(b"#?RADIANCE\nFORMAT=something_else\n\n-Y 2 +X 8\n" + b"\0" * 64)
    with pytest.raises(em.EnvmapLoadError):
        em.load_hdr(str(p))
