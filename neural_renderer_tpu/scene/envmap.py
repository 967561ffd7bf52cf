"""Environment map loading: Radiance .hdr (RGBE + RLE), EXR, PNG/JPG.

Re-implements the reference's hand-written RGBE parser
(/root/reference/src/scene.cu:32-184) in numpy, EXR/PNG via imageio
(replacing tinyexr/stb, scene.cu:204-281), and the same extension dispatch
(scene.cu:289-316). Rotation (degrees around Y) and strength are runtime
scalars carried alongside the pixel grid (scene.h:14-15, 30-31).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp


class EnvmapLoadError(RuntimeError):
    pass


def decode_rgbe(rgbe: np.ndarray) -> np.ndarray:
    """[.., 4] uint8 RGBE -> [.., 3] float32 (scene.cu:32-38)."""
    rgbe = rgbe.astype(np.int32)
    e = rgbe[..., 3]
    scale = np.where(e == 0, 0.0, np.ldexp(1.0, e - (128 + 8))).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


_RLE_LIB = None
_RLE_TRIED = False


def _load_rle_native():
    """ctypes handle to csrc/libhdr_rle.so (compiled on demand, like the
    native BVH builder in scene/bvh.py); None keeps the Python decoder."""
    global _RLE_LIB, _RLE_TRIED
    if _RLE_TRIED:
        return _RLE_LIB
    _RLE_TRIED = True
    import ctypes
    from ..utils.native import csrc_path, ensure_native_lib
    lib_path = ensure_native_lib(csrc_path("hdr_rle.cpp"),
                                 csrc_path("libhdr_rle.so"))
    if lib_path is None:
        return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.decode_hdr_rle.restype = ctypes.c_longlong
        lib.decode_hdr_rle.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        _RLE_LIB = lib
    except OSError:
        _RLE_LIB = None
    return _RLE_LIB


def load_hdr(path: str) -> np.ndarray:
    """Radiance .hdr parser with RLE scanlines (scene.cu:40-184)."""
    with open(path, "rb") as f:
        data = f.read()

    # Header: lines until blank; require 32-bit_rle_rgbe format.
    pos = 0
    format_ok = False
    while True:
        nl = data.find(b"\n", pos)
        if nl < 0:
            raise EnvmapLoadError("Truncated HDR header.")
        line = data[pos:nl]
        pos = nl + 1
        if not line:
            break
        if line.startswith(b"FORMAT=") and b"32-bit_rle_rgbe" in line:
            format_ok = True
    if not format_ok:
        raise EnvmapLoadError("Unsupported HDR format (expected 32-bit_rle_rgbe).")

    nl = data.find(b"\n", pos)
    if nl < 0:
        raise EnvmapLoadError("Missing HDR resolution line.")
    parts = data[pos:nl].split()
    pos = nl + 1
    if len(parts) != 4 or parts[0] != b"-Y" or parts[2] != b"+X":
        raise EnvmapLoadError("Invalid HDR resolution line.")
    height, width = int(parts[1]), int(parts[3])
    if width <= 0 or height <= 0:
        raise EnvmapLoadError("Invalid HDR dimensions.")

    pixels = np.zeros((height, width, 3), dtype=np.float32)
    raw = np.frombuffer(data, dtype=np.uint8)

    # Fast path: the native decoder handles the all-RLE scanline section in
    # one call (tens of seconds -> milliseconds on 4k maps). Any header it
    # does not recognise returns <0 and the Python decoder below — the
    # authoritative semantics, asserted byte-identical in tests — takes over
    # from the untouched `pos`.
    if pos + 4 <= len(raw) and raw[pos] == 2 and raw[pos + 1] == 2 \
            and (raw[pos + 2] & 0x80) == 0:
        lib = _load_rle_native()
        if lib is not None:
            import ctypes
            seg = np.ascontiguousarray(raw[pos:])
            out = np.empty((height * width, 4), dtype=np.uint8)
            consumed = lib.decode_hdr_rle(
                seg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_longlong(seg.size), width, height,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if consumed > 0:
                return decode_rgbe(out).reshape(height, width, 3)

    for y in range(height):
        if pos + 4 > len(raw):
            raise EnvmapLoadError("Unexpected end of HDR file.")
        header = raw[pos:pos + 4]
        is_rle = header[0] == 2 and header[1] == 2 and (header[2] & 0x80) == 0
        scan_w = (int(header[2]) << 8) | int(header[3])
        if not is_rle or scan_w != width or width < 8 or width > 0x7FFF:
            # Flat (non-RLE) data: the 4 header bytes are the first pixel.
            total = width * height
            flat = np.empty((total, 4), dtype=np.uint8)
            flat[0] = header
            need = (total - 1) * 4
            chunk = raw[pos + 4:pos + 4 + need]
            if chunk.size < need:
                raise EnvmapLoadError("Unexpected end of HDR file (flat data).")
            flat[1:] = chunk.reshape(total - 1, 4)
            return decode_rgbe(flat).reshape(height, width, 3)
        pos += 4

        scan = np.zeros((4, width), dtype=np.uint8)
        for channel in range(4):
            x = 0
            while x < width:
                if pos >= len(raw):
                    raise EnvmapLoadError("Unexpected end of HDR file (RLE count).")
                count = int(raw[pos]); pos += 1
                if count > 128:
                    run = count - 128
                    if pos >= len(raw):
                        raise EnvmapLoadError("Unexpected end of HDR file (RLE value).")
                    scan[channel, x:x + run] = raw[pos]
                    pos += 1
                    x += run
                else:
                    run = count
                    if run == 0 or x + run > width:
                        raise EnvmapLoadError("Invalid HDR RLE run.")
                    if pos + run > len(raw):
                        raise EnvmapLoadError("Unexpected end of HDR file (RLE data).")
                    scan[channel, x:x + run] = raw[pos:pos + run]
                    pos += run
                    x += run
        pixels[y] = decode_rgbe(scan.T.reshape(width, 4))

    return pixels


def _load_exr(path: str) -> np.ndarray:
    # Own scanline reader (scene/exr.py) — this image ships no EXR codec
    # (imageio/cv2 both decline), so like the RGBE parser above the format
    # is handled in-framework (tinyexr role, scene.cu:204-243). imageio is
    # the fallback for exotic files (PIZ etc.) in environments that have a
    # plugin for it.
    from .exr import ExrError, read_exr
    try:
        return read_exr(path)[..., :3]
    except ExrError:
        import imageio.v3 as iio
        img = np.asarray(iio.imread(path)).astype(np.float32)
        if img.ndim == 2:
            img = img[..., None].repeat(3, axis=-1)
        return img[..., :3]


def _load_ldr(path: str) -> np.ndarray:
    import imageio.v3 as iio
    img = np.asarray(iio.imread(path))
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    return img[..., :3]


@jax.tree_util.register_dataclass
@dataclass
class EnvmapArrays:
    """Device view of the environment (EnvironmentDeviceView, scene.h:10-16).

    Pixels are channel-major [3, H*W] so bilinear fetches gather dense [N]
    rows (see ops/linalg.py layout note); width/height are static."""
    pixels: jnp.ndarray   # [3, H*W] f32 (zeros when invalid)
    rotation: jnp.ndarray  # scalar f32, degrees around Y
    strength: jnp.ndarray  # scalar f32
    width: int = field(metadata=dict(static=True), default=1)
    height: int = field(metadata=dict(static=True), default=1)
    is_valid: bool = field(metadata=dict(static=True), default=False)


class EnvironmentMap:
    def __init__(self):
        self.pixels: np.ndarray | None = None  # [H, W, 3] f32
        self.rotation = 0.0
        self.strength = 1.0

    @property
    def is_valid(self) -> bool:
        return self.pixels is not None and self.pixels.size > 0

    @property
    def width(self) -> int:
        return 0 if self.pixels is None else self.pixels.shape[1]

    @property
    def height(self) -> int:
        return 0 if self.pixels is None else self.pixels.shape[0]

    def load_from_file(self, path: str) -> None:
        ext = os.path.splitext(path)[1].lower()
        if ext == ".exr":
            self.pixels = _load_exr(path)
        elif ext in (".png", ".jpg", ".jpeg"):
            self.pixels = _load_ldr(path)
        else:
            self.pixels = load_hdr(path)

    def set_rotation(self, rotation_deg: float):
        self.rotation = float(rotation_deg)

    def set_strength(self, strength: float):
        self.strength = float(strength)

    def to_arrays(self) -> EnvmapArrays:
        if self.is_valid:
            h, w = self.pixels.shape[:2]
            pix = jnp.asarray(self.pixels.reshape(-1, 3).T, jnp.float32)
        else:
            h, w = 1, 1
            pix = jnp.zeros((3, 1), jnp.float32)
        return EnvmapArrays(
            pixels=pix,
            rotation=jnp.float32(self.rotation),
            strength=jnp.float32(self.strength),
            width=w,
            height=h,
            is_valid=self.is_valid,
        )
