"""Own OpenEXR scanline reader (scene/exr.py): round-trip against a
test-local writer covering every supported compression (NONE/RLE/ZIPS/ZIP),
pixel type (HALF/FLOAT/UINT), multi-block images, luminance-only files, and
the raw-block fallback; clear errors for unsupported flavors. The reader
fills tinyexr's role (scene.cu:204-243) — no EXR codec ships in this
image's imageio/cv2."""

import struct
import zlib

import numpy as np
import pytest

from neural_renderer_tpu.scene.exr import ExrError, read_exr

_DT = {0: np.dtype("<u4"), 1: np.dtype("<f2"), 2: np.dtype("<f4")}


def _deinterleave(b: bytes) -> np.ndarray:
    a = np.frombuffer(b, np.uint8)
    half = (a.size + 1) // 2
    out = np.empty(a.size, np.uint8)
    out[:half] = a[0::2]
    out[half:] = a[1::2]
    return out


def _delta_encode(a: np.ndarray) -> bytes:
    d = a.astype(np.int64)
    d[1:] = d[1:] - d[:-1] + 128
    return (d & 0xFF).astype(np.uint8).tobytes()


def _rle_encode(b: bytes) -> bytes:
    """Simple literal-only RLE (negative counts) — valid EXR RLE stream."""
    out = bytearray()
    i = 0
    while i < len(b):
        n = min(127, len(b) - i)
        out += struct.pack("<b", -n) + b[i:i + n]
        i += n
    return bytes(out)


def write_exr(path, img, ptype=1, comp=0, channels="RGB", y_order=None):
    """Test-local scanline EXR writer (inverse of scene/exr.py)."""
    h, w = img.shape[:2]
    lines_per = {0: 1, 1: 1, 2: 1, 3: 16}[comp]

    def attr(name, typ, payload):
        return (name.encode() + b"\0" + typ.encode() + b"\0"
                + struct.pack("<i", len(payload)) + payload)

    ch = b""
    for c in sorted(channels):
        ch += (c.encode() + b"\0" + struct.pack("<i", ptype)
               + b"\0\0\0\0" + struct.pack("<ii", 1, 1))
    ch += b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (attr("channels", "chlist", ch)
              + attr("compression", "compression", bytes([comp]))
              + attr("dataWindow", "box2i", box)
              + attr("displayWindow", "box2i", box)
              + attr("lineOrder", "lineOrder", b"\0")
              + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
              + attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
              + attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
              + b"\0")

    sorted_chans = sorted(channels)
    chunks = []
    ys = list(range(0, h, lines_per))
    for y in ys:
        ny = min(lines_per, h - y)
        rows = b""
        for line in range(ny):
            for ci, c in enumerate(sorted_chans):
                plane = img[..., channels.index(c)] if img.ndim == 3 else img
                rows += np.ascontiguousarray(
                    plane[y + line]).astype(_DT[ptype]).tobytes()
        if comp in (2, 3):
            enc = zlib.compress(_delta_encode(_deinterleave(rows)))
            if len(enc) >= len(rows):
                enc = rows  # raw fallback, as real writers do
        elif comp == 1:
            enc = _rle_encode(_delta_encode(_deinterleave(rows)))
            if len(enc) >= len(rows):
                enc = rows
        else:
            enc = rows
        chunks.append((y, enc))

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", 20000630, 2))
        f.write(header)
        base = 8 + len(header) + 8 * len(chunks)
        off = base
        for y, enc in chunks:
            f.write(struct.pack("<Q", off))
            off += 8 + len(enc)
        for y, enc in chunks:
            f.write(struct.pack("<ii", y, len(enc)))
            f.write(enc)


@pytest.mark.parametrize("comp", [0, 1, 2, 3])
@pytest.mark.parametrize("ptype", [1, 2])
def test_roundtrip_compressions_and_types(tmp_path, comp, ptype):
    rng = np.random.default_rng(comp * 10 + ptype)
    img = (rng.random((37, 23, 3)) * 4.0).astype(np.float32)
    if ptype == 1:
        img = img.astype(np.float16).astype(np.float32)  # storage-exact
    p = str(tmp_path / "t.exr")
    write_exr(p, img, ptype=ptype, comp=comp)
    back = read_exr(p)
    assert back.shape == (37, 23, 3) and back.dtype == np.float32
    np.testing.assert_array_equal(back, img)


def test_uint_channels(tmp_path):
    img = np.arange(8 * 5 * 3, dtype=np.uint32).reshape(8, 5, 3)
    p = str(tmp_path / "u.exr")
    write_exr(p, img, ptype=0, comp=0)
    np.testing.assert_array_equal(read_exr(p), img.astype(np.float32))


def test_luminance_only(tmp_path):
    img = np.linspace(0, 9, 6 * 4, dtype=np.float32).reshape(6, 4)
    p = str(tmp_path / "y.exr")
    write_exr(p, img, ptype=2, comp=2, channels="Y")
    back = read_exr(p)
    assert back.shape == (6, 4, 3)
    np.testing.assert_array_equal(back[..., 0], img)
    np.testing.assert_array_equal(back[..., 1], img)


def test_zip_multiblock_tall_image(tmp_path):
    # > 16 scanlines -> multiple ZIP blocks, last one partial.
    img = (np.random.default_rng(7).random((41, 9, 3)) * 2).astype(np.float32)
    p = str(tmp_path / "tall.exr")
    write_exr(p, img, ptype=2, comp=3)
    np.testing.assert_array_equal(read_exr(p), img)


def test_incompressible_zip_block_stays_raw(tmp_path):
    # Random f32 noise rarely deflates below raw size for tiny rows; the
    # writer falls back to raw and the reader must detect it by size.
    img = np.frombuffer(np.random.default_rng(3).bytes(4 * 4 * 3 * 4),
                        np.uint32).reshape(4, 4, 3) & 0x7F7F7F7F
    img = img.view(np.float32) if False else img  # keep as UINT payload
    p = str(tmp_path / "raw.exr")
    write_exr(p, img, ptype=0, comp=3)
    np.testing.assert_array_equal(read_exr(p), img.astype(np.float32))


def test_rejects_unsupported(tmp_path):
    img = np.zeros((4, 4, 3), np.float32)
    p = str(tmp_path / "b44.exr")
    write_exr(p, img, ptype=2, comp=0)
    raw = bytearray(open(p, "rb").read())
    i = raw.index(b"compression\0compression\0")
    raw[i + len(b"compression\0compression\0") + 4] = 6  # B44
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ExrError, match="B44"):
        read_exr(p)
    open(p, "wb").write(b"NOTEXR" + bytes(64))
    with pytest.raises(ExrError, match="magic"):
        read_exr(p)


def test_corrupt_files_raise_exr_error(tmp_path):
    """Truncation / garbage anywhere must surface as ExrError (so callers'
    fallbacks fire), never a raw ValueError/struct.error or a hang."""
    img = np.zeros((4, 4, 3), np.float32)
    p = str(tmp_path / "bad.exr")
    write_exr(p, img, ptype=2, comp=3)
    data = open(p, "rb").read()
    for cut in (40, 12, len(data) - 5):
        open(p, "wb").write(data[:cut])
        with pytest.raises(ExrError):
            read_exr(p)
    # Negative attribute size must not walk the header backwards (hang).
    raw = bytearray(data)
    i = raw.index(b"dataWindow\0box2i\0")
    raw[i + len(b"dataWindow\0box2i\0"):i + len(b"dataWindow\0box2i\0") + 4] = \
        (-8).to_bytes(4, "little", signed=True)
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ExrError):
        read_exr(p)


def test_envmap_dispatch(tmp_path):
    from neural_renderer_tpu.scene.envmap import EnvironmentMap
    img = (np.random.default_rng(0).random((8, 16, 3)) * 3).astype(np.float32)
    p = str(tmp_path / "env.exr")
    write_exr(p, img, ptype=2, comp=3)
    env = EnvironmentMap()
    env.load_from_file(p)
    assert env.is_valid
    np.testing.assert_array_equal(env.pixels, img)

# ---------------------------------------------------------------------------
# PIZ / PXR24 (scene/exr_piz.py) + the production writer (scene/exr_write.py)
# ---------------------------------------------------------------------------
# The PIZ encoder and decoder are implemented independently from the OpenEXR
# format spec (ImfPizCompressor/ImfHuf/ImfWav semantics), so a round-trip
# exercises both directions of each stage (bitmap/LUT, wavelet, canonical
# Huffman incl. the run-length escape). No reference PIZ file exists in this
# image (zero egress); the NONE-path reader is separately validated against a
# real-world file in test_reads_real_world_exr.

from neural_renderer_tpu.scene.exr_piz import (
    bitmap_from_data, forward_lut_from_bitmap, huf_compress, huf_uncompress,
    reverse_lut_from_bitmap, wav2_decode, wav2_encode)
from neural_renderer_tpu.scene.exr_write import write_exr as write_exr_prod


@pytest.mark.parametrize("shape", [(7, 5), (32, 32), (1, 9), (9, 1), (33, 70)])
@pytest.mark.parametrize("mx", [100, 40000])
def test_wavelet_roundtrip(shape, mx):
    # mx selects the 14-bit (int16) vs 16-bit (mod-arithmetic) pair coder.
    rng = np.random.default_rng(shape[0] * 100 + mx)
    plane = rng.integers(0, mx + 1, shape).astype(np.uint16)
    enc = wav2_encode(plane.copy(), mx)
    dec = wav2_decode(enc.copy(), mx)
    np.testing.assert_array_equal(dec, plane)


def test_huffman_roundtrip_with_runs():
    rng = np.random.default_rng(0)
    # Long runs exercise the run-length escape symbol (code iM, 8-bit count).
    data = np.concatenate([
        rng.integers(0, 2000, 5000),
        np.full(700, 1234),          # run > 255 -> multiple escapes
        rng.integers(0, 65000, 100),  # sparse high values -> long codes
        np.zeros(17),
    ]).astype(np.uint16)
    back = huf_uncompress(huf_compress(data), data.size)
    np.testing.assert_array_equal(back, data)


def test_huffman_single_symbol():
    data = np.full(1000, 42, np.uint16)
    back = huf_uncompress(huf_compress(data), data.size)
    np.testing.assert_array_equal(back, data)


def test_bitmap_lut_inverse():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 65536, 4096).astype(np.uint16)
    bitmap, _, _ = bitmap_from_data(data)
    fwd, max_f = forward_lut_from_bitmap(bitmap)
    rev, max_r = reverse_lut_from_bitmap(bitmap)
    assert max_f == max_r
    np.testing.assert_array_equal(rev[fwd[data]], data)
    assert fwd[data].max() == max_f


@pytest.mark.parametrize("half", [True, False])
def test_piz_roundtrip(tmp_path, half):
    rng = np.random.default_rng(4)
    # 70 rows -> 3 PIZ blocks (32 lines each), last partial.
    img = (rng.random((70, 33, 3)) * 8.0).astype(np.float32)
    p = str(tmp_path / "p.exr")
    write_exr_prod(p, img, "piz", half=half)
    ref = img.astype(np.float16).astype(np.float32) if half else img
    np.testing.assert_array_equal(read_exr(p), ref)


def test_piz_compresses_smooth_data(tmp_path):
    # The point of PIZ: a smooth HDR gradient should shrink well below raw.
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    img = np.stack([y / 64, x / 64, (x + y) / 128], -1)
    p = str(tmp_path / "s.exr")
    write_exr_prod(p, img, "piz")
    import os
    assert os.path.getsize(p) < 64 * 64 * 3 * 2 * 0.6


@pytest.mark.parametrize("comp", ["none", "zips", "zip"])
def test_production_writer_other_compressions(tmp_path, comp):
    rng = np.random.default_rng(5)
    img = (rng.random((21, 13, 3)) * 3).astype(np.float32)
    p = str(tmp_path / "w.exr")
    write_exr_prod(p, img, comp, half=False)
    np.testing.assert_array_equal(read_exr(p), img)


def test_production_writer_luminance(tmp_path):
    img = np.linspace(0, 5, 40, dtype=np.float32).reshape(8, 5)
    p = str(tmp_path / "y.exr")
    write_exr_prod(p, img, "piz", half=False)
    np.testing.assert_array_equal(read_exr(p)[..., 0], img)


def test_pxr24_decode(tmp_path):
    """Build a PXR24 file by hand (delta-coded byte planes per the format
    notes) and check the reader reconstructs the 24-bit-truncated floats."""
    import struct
    import zlib
    rng = np.random.default_rng(6)
    h, w = 5, 7
    img = (rng.random((h, w, 3)) * 4).astype(np.float32)
    planes = {c: img[..., "RGB".index(c)] for c in "RGB"}
    blob = bytearray()
    for y in range(h):
        for c in sorted("RGB"):
            u = planes[c][y].view(np.uint32).astype(np.uint32) >> 8  # 24-bit
            diff = np.diff(u.astype(np.int64), prepend=0) & 0xFFFFFF
            blob += (diff >> 16).astype(np.uint8).tobytes()
            blob += ((diff >> 8) & 0xFF).astype(np.uint8).tobytes()
            blob += (diff & 0xFF).astype(np.uint8).tobytes()
    payload = zlib.compress(bytes(blob))

    def attr(name, typ, v):
        return (name.encode() + b"\0" + typ.encode() + b"\0"
                + struct.pack("<i", len(v)) + v)

    ch = b""
    for c in sorted("RGB"):
        ch += c.encode() + b"\0" + struct.pack("<i", 2) + b"\0\0\0\0" + struct.pack("<ii", 1, 1)
    ch += b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (attr("channels", "chlist", ch)
              + attr("compression", "compression", bytes([5]))
              + attr("dataWindow", "box2i", box) + b"\0")
    p = str(tmp_path / "pxr.exr")
    with open(p, "wb") as f:
        f.write(struct.pack("<ii", 20000630, 2))
        f.write(header)
        f.write(struct.pack("<Q", 8 + len(header) + 8))
        f.write(struct.pack("<ii", 0, len(payload)))
        f.write(payload)
    back = read_exr(p)
    expect = (img.view(np.uint32) & 0xFFFFFF00).view(np.float32)
    np.testing.assert_array_equal(back, expect)


def test_reads_real_world_exr():
    """Interop: an EXR produced by a real third-party writer (from the
    CPython test suite on this image) — RGBA channels, DECREASING_Y line
    order, NONE compression."""
    import os
    p = ("/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
         "test/imghdrdata/python.exr")
    if not os.path.exists(p):
        pytest.skip("real-world EXR sample not present")
    img = read_exr(p)
    assert img.shape == (16, 16, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0 and img.max() > 0.5


def test_envmap_dispatch_piz(tmp_path):
    from neural_renderer_tpu.scene.envmap import EnvironmentMap
    img = (np.random.default_rng(9).random((8, 16, 3)) * 3).astype(np.float32)
    p = str(tmp_path / "env_piz.exr")
    write_exr_prod(p, img, "piz", half=False)
    env = EnvironmentMap()
    env.load_from_file(p)
    assert env.is_valid
    np.testing.assert_array_equal(env.pixels, img)


def test_piz_reference_fixture():
    """Decode PIZ/PXR24 files produced by the REAL OpenEXR 3.1 library
    (generated by scripts/make_exr_fixture.py with the system libOpenEXR;
    checked in as tests/golden/*_reference.exr). Closes the mutual-inverse
    risk of validating the codecs only against this repo's own encoder
    (ADVICE r3): PIZ must match the regenerated pattern bit-exactly; PXR24
    to its 24-bit mantissa truncation."""
    import os
    import sys
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(os.path.dirname(here), "scripts"))
    from make_exr_fixture import reference_pattern
    img = reference_pattern()

    piz = os.path.join(here, "golden", "piz_reference.exr")
    got = read_exr(piz)
    np.testing.assert_array_equal(got, img)

    pxr = os.path.join(here, "golden", "pxr24_reference.exr")
    got = read_exr(pxr)
    expect = (img.view(np.uint32) & 0xFFFFFF00).view(np.float32)
    np.testing.assert_array_equal(got, expect)


def _exr_chunks(path):
    """Minimal chunk walker: yields (raw_block_bytes, chans, width, ny) for
    each scanline block — lets tests drive block decoders directly on
    channels read_exr's RGB output doesn't surface (alpha, Z)."""
    import struct
    with open(path, "rb") as f:
        data = f.read()
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\0", pos)
        name = data[pos:e].decode()
        pos = e + 1
        e = data.index(b"\0", pos)
        pos = e + 1
        size = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        attrs[name] = data[pos:pos + size]
        pos += size
    pos += 1
    chans = []
    cbuf, cp = attrs["channels"], 0
    while cbuf[cp] != 0:
        e = cbuf.index(b"\0", cp)
        cname = cbuf[cp:e].decode()
        cp = e + 1
        ptype = struct.unpack_from("<i", cbuf, cp)[0]
        cp += 16
        chans.append((cname, ptype))
    comp = attrs["compression"][0]
    lines_per = {8: 32, 9: 256}[comp]
    xmin, ymin, xmax, ymax = struct.unpack_from("<iiii", attrs["dataWindow"])
    width, height = xmax - xmin + 1, ymax - ymin + 1
    nchunks = (height + lines_per - 1) // lines_per
    offsets = struct.unpack_from(f"<{nchunks}Q", data, pos)
    for off in offsets:
        y, size = struct.unpack_from("<ii", data, off)
        ny = min(lines_per, ymax - y + 1)
        yield data[off + 8:off + 8 + size], chans, width, ny


def test_dwa_reference_fixture():
    """Decode DWAA/DWAB files produced by the REAL OpenEXR 3.1 library
    (scripts/make_dwa_fixture.py) against the library's own decode. DWA's
    lossy-DCT channels go through float IDCT + CSC whose compiled rounding
    we can't reproduce exactly, so the RGB bar is tolerance-exact: >=99.9%
    of halfs bit-identical, none further than 4 half-ulps. The RLE (alpha)
    and UNKNOWN (float Z) schemes are lossless and must be BIT-exact."""
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("dwaa", "dwab"):
        path = os.path.join(here, "golden", f"{name}_reference.exr")
        want = np.load(os.path.join(here, "golden",
                                    f"{name}_reference_decode.npy"))
        got = read_exr(path)
        gb = got.astype(np.float16).view(np.uint16).astype(int)
        wb = want[:, :, :3].astype(np.float16).view(np.uint16).astype(int)
        ulp = np.abs(gb - wb)
        assert (ulp == 0).mean() >= 0.999, name
        assert ulp.max() <= 4, name

    # dwaa fixture RGBA: A takes the RLE scheme (lossless).
    from neural_renderer_tpu.scene.exr_dwa import dwa_uncompress_block
    path = os.path.join(here, "golden", "dwaa_reference.exr")
    want = np.load(os.path.join(here, "golden", "dwaa_reference_decode.npy"))
    rows = []
    for raw, chans, width, ny in _exr_chunks(path):
        assert [c for c, _ in chans] == ["A", "B", "G", "R"]
        out = np.frombuffer(dwa_uncompress_block(raw, chans, width, ny),
                            np.uint8).reshape(ny, len(chans), width * 2)
        rows.append(out)
    dec = np.concatenate(rows, axis=0)
    alpha = dec[:, 0].reshape(-1, dec.shape[2] // 2 * 2)
    alpha = np.frombuffer(alpha.tobytes(), np.float16).reshape(want.shape[:2])
    np.testing.assert_array_equal(alpha.astype(np.float32), want[:, :, 3])

    # dwab fixture RGB+Z: float Z takes the UNKNOWN/deflate scheme
    # (lossless) — and its rows are wider than the half channels.
    path = os.path.join(here, "golden", "dwab_reference.exr")
    want = np.load(os.path.join(here, "golden", "dwab_reference_decode.npy"))
    zrows = []
    for raw, chans, width, ny in _exr_chunks(path):
        assert [c for c, _ in chans] == ["B", "G", "R", "Z"]
        out = dwa_uncompress_block(raw, chans, width, ny)
        row_bytes = width * (2 * 3 + 4)
        for r in range(ny):
            row = out[r * row_bytes:(r + 1) * row_bytes]
            zrows.append(np.frombuffer(row[width * 6:], np.float32))
    z = np.stack(zrows)
    np.testing.assert_array_equal(z, want[:, :, 3])


def test_b44_reference_fixture():
    """Decode B44/B44A files produced by the REAL OpenEXR 3.1 library and
    compare against the library's own decode (B44 is lossy, so the oracle
    is OpenEXR's reader output, stored as *_reference_decode.npy at fixture
    generation). Must match bit-exactly."""
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("b44", "b44a"):
        path = os.path.join(here, "golden", f"{name}_reference.exr")
        want = np.load(os.path.join(here, "golden",
                                    f"{name}_reference_decode.npy"))
        got = read_exr(path)
        np.testing.assert_array_equal(got, want, err_msg=name)
