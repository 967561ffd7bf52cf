#!/usr/bin/env python
"""Generate tests/golden/piz_reference.exr with the REAL OpenEXR library.

The PIZ/PXR24 codecs in scene/exr_piz.py were initially validated only
against this repo's own encoder (mutual-inverse risk, ADVICE r3 #4). This
script compiles a tiny C++ program against the system OpenEXR 3.1
(libOpenEXR-3_1, /usr/include/OpenEXR) and writes:

  tests/golden/piz_reference.exr    -- PIZ-compressed HALF RGB, 64x48
                                       (2 scanline blocks), deterministic
                                       pattern mixing smooth gradients,
                                       constants and pseudo-noise
  tests/golden/pxr24_reference.exr  -- same pattern, PXR24 FLOAT RGB

tests/test_exr.py::test_piz_reference_fixture decodes them with this repo's
reader and compares against the regenerated pattern. The same C++ binary is
also used here (generation time) to READ BACK a PIZ file produced by this
repo's writer, closing the loop in both directions; the result is printed.

Run from the repo root: python scripts/make_exr_fixture.py
"""
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CPP = r"""
#include <ImfOutputFile.h>
#include <ImfInputFile.h>
#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <half.h>
#include <cstdio>
#include <cstring>
#include <vector>
using namespace Imf;
using namespace Imath;

// write <out.exr> <w> <h> <piz|pxr24> <raw_rgb_float32_file>
// read  <in.exr>  <w> <h> <raw_rgb_float32_out>
int main(int argc, char **argv) {
    if (argc < 2) return 2;
    std::string mode = argv[1];
    if (mode == "write") {
        const char *path = argv[2];
        int w = atoi(argv[3]), h = atoi(argv[4]);
        std::string comp = argv[5];
        FILE *f = fopen(argv[6], "rb");
        std::vector<float> data(w * h * 3);
        if (fread(data.data(), 4, data.size(), f) != data.size()) return 3;
        fclose(f);
        Header hdr(w, h);
        hdr.compression() = comp == "piz" ? PIZ_COMPRESSION
                          : comp == "b44" ? B44_COMPRESSION
                          : comp == "b44a" ? B44A_COMPRESSION
                          : PXR24_COMPRESSION;
        bool use_half = comp != "pxr24";
        PixelType pt = use_half ? HALF : FLOAT;
        hdr.channels().insert("R", Channel(pt));
        hdr.channels().insert("G", Channel(pt));
        hdr.channels().insert("B", Channel(pt));
        OutputFile file(path, hdr);
        FrameBuffer fb;
        std::vector<half> hbuf;
        if (use_half) {
            hbuf.resize(w * h * 3);
            for (size_t i = 0; i < hbuf.size(); i++) hbuf[i] = half(data[i]);
            // interleaved RGB: R at offset 0, G at 1, B at 2
            fb.insert("R", Slice(HALF, (char*)&hbuf[0], 6, 6 * w));
            fb.insert("G", Slice(HALF, (char*)&hbuf[1], 6, 6 * w));
            fb.insert("B", Slice(HALF, (char*)&hbuf[2], 6, 6 * w));
        } else {
            fb.insert("R", Slice(FLOAT, (char*)&data[0], 12, 12 * w));
            fb.insert("G", Slice(FLOAT, (char*)&data[1], 12, 12 * w));
            fb.insert("B", Slice(FLOAT, (char*)&data[2], 12, 12 * w));
        }
        file.setFrameBuffer(fb);
        file.writePixels(h);
        return 0;
    } else if (mode == "read") {
        InputFile file(argv[2]);
        Box2i dw = file.header().dataWindow();
        int w = dw.max.x - dw.min.x + 1, h = dw.max.y - dw.min.y + 1;
        std::vector<float> data(w * h * 3);
        FrameBuffer fb;
        fb.insert("R", Slice(FLOAT, (char*)&data[0], 12, 12 * w));
        fb.insert("G", Slice(FLOAT, (char*)&data[1], 12, 12 * w));
        fb.insert("B", Slice(FLOAT, (char*)&data[2], 12, 12 * w));
        file.setFrameBuffer(fb);
        file.readPixels(dw.min.y, dw.max.y);
        FILE *f = fopen(argv[3], "wb");
        fwrite(data.data(), 4, data.size(), f);
        fclose(f);
        printf("%d %d\n", w, h);
        return 0;
    }
    return 2;
}
"""


def reference_pattern(w=64, h=48):
    """Deterministic HALF-representable pattern: gradients + constant rows +
    pseudo-noise + specials — exercises the PIZ bitmap/LUT, wavelet and
    Huffman paths (identical in tests/test_exr.py)."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    r = x / w * 4.0
    g = np.where(y < 8, 0.25, np.sin(x * 0.7 + y * 1.3) * 2.0 + 2.0)
    rng = np.random.RandomState(42)
    b = rng.rand(h, w).astype(np.float32) * 8.0
    img = np.stack([r, g, b], axis=-1).astype(np.float32)
    # snap to half precision (PIZ file stores HALF)
    return np.asarray(img, dtype=np.float16).astype(np.float32)


def main():
    bin_path = os.path.join(tempfile.gettempdir(), "exr_fixture_tool")
    cpp_path = os.path.join(tempfile.gettempdir(), "exr_fixture_tool.cpp")
    with open(cpp_path, "w") as f:
        f.write(CPP)
    subprocess.check_call([
        "g++", "-O2", "-o", bin_path, cpp_path,
        "-I/usr/include/OpenEXR", "-I/usr/include/Imath",
        "-lOpenEXR-3_1", "-lImath-3_1", "-lIex-3_1", "-lIlmThread-3_1"])

    img = reference_pattern()
    h, w = img.shape[:2]
    raw = os.path.join(tempfile.gettempdir(), "fixture_raw.f32")
    img.astype(np.float32).tofile(raw)
    golden = os.path.join(ROOT, "tests", "golden")
    os.makedirs(golden, exist_ok=True)
    piz_path = os.path.join(golden, "piz_reference.exr")
    pxr_path = os.path.join(golden, "pxr24_reference.exr")
    b44_path = os.path.join(golden, "b44_reference.exr")
    b44a_path = os.path.join(golden, "b44a_reference.exr")
    subprocess.check_call([bin_path, "write", piz_path, str(w), str(h), "piz", raw])
    subprocess.check_call([bin_path, "write", pxr_path, str(w), str(h), "pxr24", raw])
    subprocess.check_call([bin_path, "write", b44_path, str(w), str(h), "b44", raw])
    subprocess.check_call([bin_path, "write", b44a_path, str(w), str(h), "b44a", raw])
    for pth in (piz_path, pxr_path, b44_path, b44a_path):
        print(f"wrote {pth} ({os.path.getsize(pth)} B)")

    # B44 is LOSSY (shift-and-round): the reference decode is what the
    # OpenEXR library itself reads back, not the input pattern. Store it.
    for pth, name in ((b44_path, "b44"), (b44a_path, "b44a")):
        back_raw = os.path.join(tempfile.gettempdir(), f"{name}_back.f32")
        outp = subprocess.check_output([bin_path, "read", pth, back_raw]).split()
        dec = np.fromfile(back_raw, np.float32).reshape(int(outp[1]), int(outp[0]), 3)
        np.save(os.path.join(golden, f"{name}_reference_decode.npy"), dec)

    # Cross-check 1: repo reader vs OpenEXR-written files.
    sys.path.insert(0, ROOT)
    from neural_renderer_tpu.scene.exr import read_exr
    for name in ("b44", "b44a"):
        pth = os.path.join(golden, f"{name}_reference.exr")
        want = np.load(os.path.join(golden, f"{name}_reference_decode.npy"))
        got = read_exr(pth)
        ok = np.array_equal(got, want)
        print(f"repo reader vs OpenEXR decode {name}: {'EXACT' if ok else 'MISMATCH'}")
        if not ok:
            d = np.abs(got - want)
            print("  max", d.max(), "frac", (d > 0).mean())
            sys.exit(1)
    for path, tol in ((piz_path, 0.0), (pxr_path, None)):
        got = read_exr(path)
        if tol == 0.0:
            ok = np.array_equal(got, img)
        else:  # PXR24 is lossy for FLOAT (24-bit mantissa truncation)
            ok = np.allclose(got, img, rtol=1e-4, atol=1e-4)
        print(f"repo reader vs OpenEXR {os.path.basename(path)}: "
              f"{'EXACT' if tol == 0.0 and ok else 'OK' if ok else 'MISMATCH'}")
        if not ok:
            sys.exit(1)

    # Cross-check 2: repo PIZ writer -> OpenEXR reader.
    from neural_renderer_tpu.scene.exr_write import write_exr
    mine = os.path.join(tempfile.gettempdir(), "repo_piz.exr")
    write_exr(mine, img, compression="piz", half=True)
    back_raw = os.path.join(tempfile.gettempdir(), "back.f32")
    out = subprocess.check_output([bin_path, "read", mine, back_raw]).split()
    rw, rh = int(out[0]), int(out[1])
    back = np.fromfile(back_raw, np.float32).reshape(rh, rw, 3)
    ok = np.array_equal(back, img)
    print(f"OpenEXR reads repo PIZ writer output: {'EXACT' if ok else 'MISMATCH'}")
    if not ok:
        d = np.abs(back - img)
        print("max abs diff", d.max(), "at", np.unravel_index(d.argmax(), d.shape))
        sys.exit(1)


if __name__ == "__main__":
    main()
