// DWA fixture tool: write/read EXRs with the system OpenEXR 3.1 so the
// repo's own DWAA/DWAB decoder (scene/exr_dwa.py) can be validated against
// the real library (the same approach as scripts/make_exr_fixture.py for
// PIZ/B44). Channel layouts cover every DWA scheme: RGB half (LOSSY_DCT via
// the 709 CSC), A half (RLE), a float Z (UNKNOWN/deflate), and Y-only.
//
//   write <out.exr> <w> <h> <dwaa|dwab> <layout> <raw_f32_file> [level]
//       layout: rgb | rgba | rgbz | y   (raw file = w*h*nchan float32,
//       channel-interleaved in layout order)
//   read <in.exr> <layout> <raw_f32_out>   (decodes with OpenEXR; output
//       w*h*nchan float32 in the same order — the ground truth)
#include <ImfOutputFile.h>
#include <ImfInputFile.h>
#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <ImfStandardAttributes.h>
#include <half.h>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
using namespace Imf;
using namespace Imath;

static std::vector<std::string> layoutChans(const std::string &layout,
                                            std::vector<PixelType> &types) {
    std::vector<std::string> names;
    if (layout == "rgb") {
        names = {"R", "G", "B"};
        types = {HALF, HALF, HALF};
    } else if (layout == "rgba") {
        names = {"R", "G", "B", "A"};
        types = {HALF, HALF, HALF, HALF};
    } else if (layout == "rgbz") {
        names = {"R", "G", "B", "Z"};
        types = {HALF, HALF, HALF, FLOAT};
    } else if (layout == "y") {
        names = {"Y"};
        types = {HALF};
    }
    return names;
}

int main(int argc, char **argv) {
    if (argc < 2) return 2;
    std::string mode = argv[1];
    if (mode == "write") {
        const char *path = argv[2];
        int w = atoi(argv[3]), h = atoi(argv[4]);
        std::string comp = argv[5], layout = argv[6];
        FILE *f = fopen(argv[7], "rb");
        std::vector<PixelType> types;
        std::vector<std::string> names = layoutChans(layout, types);
        int nc = (int)names.size();
        std::vector<float> data((size_t)w * h * nc);
        if (fread(data.data(), 4, data.size(), f) != data.size()) return 3;
        fclose(f);
        Header hdr(w, h);
        hdr.compression() = comp == "dwab" ? DWAB_COMPRESSION : DWAA_COMPRESSION;
        if (argc > 8) addDwaCompressionLevel(hdr, (float)atof(argv[8]));
        for (int c = 0; c < nc; c++)
            hdr.channels().insert(names[c].c_str(), Channel(types[c]));
        OutputFile file(path, hdr);
        FrameBuffer fb;
        std::vector<half> hbuf((size_t)w * h * nc);
        for (size_t i = 0; i < hbuf.size(); i++) hbuf[i] = half(data[i]);
        for (int c = 0; c < nc; c++) {
            if (types[c] == HALF)
                fb.insert(names[c].c_str(),
                          Slice(HALF, (char*)&hbuf[c], 2 * nc, 2 * (size_t)nc * w));
            else
                fb.insert(names[c].c_str(),
                          Slice(FLOAT, (char*)&data[c], 4 * nc, 4 * (size_t)nc * w));
        }
        file.setFrameBuffer(fb);
        file.writePixels(h);
        return 0;
    } else if (mode == "read") {
        InputFile file(argv[2]);
        std::string layout = argv[3];
        std::vector<PixelType> types;
        std::vector<std::string> names = layoutChans(layout, types);
        int nc = (int)names.size();
        Box2i dw = file.header().dataWindow();
        int w = dw.max.x - dw.min.x + 1, h = dw.max.y - dw.min.y + 1;
        std::vector<float> data((size_t)w * h * nc);
        FrameBuffer fb;
        for (int c = 0; c < nc; c++)
            fb.insert(names[c].c_str(),
                      Slice(FLOAT, (char*)&data[c], 4 * nc, 4 * (size_t)nc * w));
        file.setFrameBuffer(fb);
        file.readPixels(dw.min.y, dw.max.y);
        FILE *out = fopen(argv[4], "wb");
        fwrite(data.data(), 4, data.size(), out);
        fclose(out);
        printf("%d %d %d\n", w, h, nc);
        return 0;
    }
    return 2;
}
