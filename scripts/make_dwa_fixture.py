#!/usr/bin/env python
"""Generate DWAA/DWAB reference fixtures with the REAL OpenEXR 3.1 library.

Compiles scripts/dwa_fixture_tool.cpp against the system libOpenEXR and
writes:

  tests/golden/dwaa_reference.exr          RGBA half, 64x48 (2 DWAA blocks),
                                           A exercises the RLE scheme
  tests/golden/dwaa_reference_decode.npy   OpenEXR's own decode [48,64,4] --
                                           the oracle (DWA is lossy)
  tests/golden/dwab_reference.exr          RGB half + float Z, 64x300
                                           (2 DWAB blocks), Z exercises the
                                           UNKNOWN/deflate scheme
  tests/golden/dwab_reference_decode.npy   OpenEXR's decode [300,64,4]

tests/test_exr.py::test_dwa_reference_fixture decodes the files with this
repo's reader (scene/exr_dwa.py) and compares against the stored oracle.

Run from the repo root: python scripts/make_dwa_fixture.py
"""
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "tests", "golden")
TOOL = "/tmp/dwa_fixture_tool_bin"


def pattern(w: int, h: int, nc: int) -> np.ndarray:
    """Smooth gradients + hard structure, values spanning [0, ~1.5] so both
    sides of the nonlinear transfer's 1.0 knee are exercised; the alpha/Z
    plane has flat runs (RLE-friendly) with steps."""
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    ch = [(0.5 + 0.5 * np.sin(x / 9.0)) * 1.2,
          (0.5 + 0.5 * np.cos(y / 7.0)) * 0.8,
          (x + y) / (w + h) * 1.5,
          0.25 + 0.5 * (x % 7 == 0) + 0.125 * (y // 16)]
    return np.stack(ch[:nc], -1).astype(np.float32)


def build_tool():
    subprocess.run(
        ["g++", "-O2", "-o", TOOL,
         os.path.join(ROOT, "scripts", "dwa_fixture_tool.cpp"),
         "-I/usr/include/OpenEXR", "-I/usr/include/Imath",
         "-lOpenEXR-3_1", "-lImath-3_1", "-lIex-3_1", "-lIlmThread-3_1"],
        check=True)


def make(name: str, comp: str, layout: str, w: int, h: int):
    nc = {"rgb": 3, "rgba": 4, "rgbz": 4, "y": 1}[layout]
    img = pattern(w, h, nc)
    raw = "/tmp/dwa_fixture_in.f32"
    img.tofile(raw)
    exr = os.path.join(GOLDEN, f"{name}_reference.exr")
    subprocess.run([TOOL, "write", exr, str(w), str(h), comp, layout, raw],
                   check=True)
    back = "/tmp/dwa_fixture_back.f32"
    subprocess.run([TOOL, "read", exr, layout, back], check=True)
    oracle = np.fromfile(back, np.float32).reshape(h, w, nc)
    np.save(os.path.join(GOLDEN, f"{name}_reference_decode.npy"), oracle)

    from neural_renderer_tpu.scene.exr import read_exr
    got = read_exr(exr)
    gb = got.astype(np.float16).view(np.uint16).astype(int)
    ob = oracle[:, :, :3].astype(np.float16).view(np.uint16).astype(int)
    ulp = np.abs(gb - ob)
    print(f"{name}: {exr} ({os.path.getsize(exr)} B) repo-vs-OpenEXR RGB "
          f"bit-exact {(ulp == 0).mean():.5f}, max ulp {ulp.max()}")


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    sys.path.insert(0, ROOT)
    build_tool()
    make("dwaa", "dwaa", "rgba", 64, 48)
    make("dwab", "dwab", "rgbz", 64, 300)


if __name__ == "__main__":
    main()
