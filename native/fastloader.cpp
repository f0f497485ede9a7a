// Native image-loading pipeline for gen_adversarial_tpu.
//
// The reference's data path is PIL-in-Python inside torch DataLoader workers
// (data/datasets.py); feeding a TPU chip at thousands of images/sec needs the
// decode+resize+normalize hot loop in native code.  This library provides:
//
//   fl_decode_resize(path, out_h, out_w, out)       one image -> f32 HWC [0,1]
//   fl_decode_batch(paths, n, out_h, out_w, out, t) threaded batch decode
//
// JPEG via libjpeg, PNG via libpng (both system libraries); bilinear
// (half-pixel) resize; output is float32 NHWC in [0,1], exactly the layout
// jax.device_put expects.  Exposed over a plain C ABI for ctypes (no
// pybind11 in this environment).
//
// Build: make -C native   (or python -m gen_adversarial_tpu.data.fastloader)

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cstdint>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
    int w = 0, h = 0, c = 0;
    std::vector<uint8_t> data;  // HWC uint8
};

// ----------------------------------------------------------------- JPEG
struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* img) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    img->w = cinfo.output_width;
    img->h = cinfo.output_height;
    img->c = 3;
    img->data.resize(size_t(img->w) * img->h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = img->data.data() + size_t(cinfo.output_scanline) * img->w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

// ------------------------------------------------------------------ PNG
bool decode_png(FILE* f, Image* img) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    png_init_io(png, f);
    png_read_info(png, info);

    png_uint_32 w, h;
    int bit_depth, color_type;
    png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
                 nullptr);

    // normalize to 8-bit RGB
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_read_update_info(png, info);

    img->w = int(w);
    img->h = int(h);
    img->c = 3;
    img->data.resize(size_t(w) * h * 3);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; y++)
        rows[y] = img->data.data() + size_t(y) * w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

bool decode_file(const char* path, Image* img) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    uint8_t magic[8] = {0};
    size_t got = fread(magic, 1, 8, f);
    rewind(f);
    bool ok = false;
    if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
        ok = decode_jpeg(f, img);
    } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
        ok = decode_png(f, img);
    }
    fclose(f);
    return ok;
}

// bilinear resize (half-pixel centers) uint8 HWC -> float32 HWC in [0,1]
void resize_to_float(const Image& img, int out_h, int out_w, float* out) {
    const float sy = float(img.h) / out_h;
    const float sx = float(img.w) / out_w;
    const uint8_t* src = img.data.data();
    const int W = img.w, H = img.h;
    for (int oy = 0; oy < out_h; oy++) {
        float fy = (oy + 0.5f) * sy - 0.5f;
        int y0 = std::max(0, std::min(H - 1, int(std::floor(fy))));
        int y1 = std::min(H - 1, y0 + 1);
        float wy = std::max(0.0f, std::min(1.0f, fy - y0));
        for (int ox = 0; ox < out_w; ox++) {
            float fx = (ox + 0.5f) * sx - 0.5f;
            int x0 = std::max(0, std::min(W - 1, int(std::floor(fx))));
            int x1 = std::min(W - 1, x0 + 1);
            float wx = std::max(0.0f, std::min(1.0f, fx - x0));
            float* dst = out + (size_t(oy) * out_w + ox) * 3;
            for (int ch = 0; ch < 3; ch++) {
                float a = src[(size_t(y0) * W + x0) * 3 + ch];
                float b = src[(size_t(y0) * W + x1) * 3 + ch];
                float cpx = src[(size_t(y1) * W + x0) * 3 + ch];
                float d = src[(size_t(y1) * W + x1) * 3 + ch];
                float top = a + (b - a) * wx;
                float bot = cpx + (d - cpx) * wx;
                dst[ch] = (top + (bot - top) * wy) * (1.0f / 255.0f);
            }
        }
    }
}

}  // namespace

extern "C" {

int fl_decode_resize(const char* path, int out_h, int out_w, float* out) {
    Image img;
    if (!decode_file(path, &img)) return -1;
    resize_to_float(img, out_h, out_w, out);
    return 0;
}

// Threaded batch decode: out must hold n * out_h * out_w * 3 floats.
// Returns the number of successfully decoded images (failures are zeroed).
int fl_decode_batch(const char** paths, int n, int out_h, int out_w,
                    float* out, int n_threads) {
    if (n_threads <= 0)
        n_threads = int(std::thread::hardware_concurrency());
    n_threads = std::max(1, std::min(n_threads, n));
    std::atomic<int> next(0), ok(0);
    const size_t stride = size_t(out_h) * out_w * 3;

    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            if (fl_decode_resize(paths[i], out_h, out_w, out + stride * i) == 0) {
                ok.fetch_add(1);
            } else {
                memset(out + stride * i, 0, stride * sizeof(float));
            }
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return ok.load();
}

}  // extern "C"
