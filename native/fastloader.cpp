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
    bool trns = png_get_valid(png, info, PNG_INFO_tRNS) != 0;
    if (trns) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    // strip alpha whether it was native (MASK_ALPHA) or synthesized by the
    // tRNS expansion above - palette/gray/RGB + tRNS would otherwise decode
    // 4-channel into the 3-channel buffer below (heap overflow)
    if ((color_type & PNG_COLOR_MASK_ALPHA) || trns) png_set_strip_alpha(png);
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

// Antialiased separable triangle-filter resize, the same algorithm as
// PIL/torchvision Resize(BILINEAR) (support scaled by the downscale factor)
// so the native path and the PIL fallback in datasets.py produce the same
// preprocessing (the reference's transform is torchvision Resize with
// antialias=True, data/datasets.py:27 upstream).
struct Filter1D {
    std::vector<int> start;      // first source index per output index
    std::vector<int> count;      // taps per output index
    std::vector<float> weights;  // ksize-strided normalized taps
    int ksize = 0;
};

Filter1D make_triangle(int in_size, int out_size) {
    const double scale = double(in_size) / out_size;
    const double fscale = std::max(1.0, scale);
    const double support = 1.0 * fscale;  // triangle filter support = 1
    Filter1D f;
    f.ksize = int(std::ceil(support)) * 2 + 1;
    f.start.resize(out_size);
    f.count.resize(out_size);
    f.weights.assign(size_t(out_size) * f.ksize, 0.0f);
    std::vector<double> w(f.ksize);
    for (int o = 0; o < out_size; o++) {
        const double center = (o + 0.5) * scale;
        int xmin = std::max(0, int(center - support + 0.5));
        int xmax = std::min(in_size, int(center + support + 0.5));
        double total = 0.0;
        for (int x = xmin; x < xmax; x++) {
            double t = std::abs((x - center + 0.5) / fscale);
            w[x - xmin] = t < 1.0 ? 1.0 - t : 0.0;
            total += w[x - xmin];
        }
        f.start[o] = xmin;
        f.count[o] = xmax - xmin;
        for (int k = 0; k < xmax - xmin; k++)
            f.weights[size_t(o) * f.ksize + k] =
                total > 0 ? float(w[k] / total) : 0.0f;
    }
    return f;
}

// uint8 HWC -> float32 HWC in [0,1]
void resize_to_float(const Image& img, int out_h, int out_w, float* out) {
    const uint8_t* src = img.data.data();
    const int W = img.w, H = img.h;
    if (W == out_w && H == out_h) {
        const size_t n = size_t(H) * W * 3;
        for (size_t i = 0; i < n; i++) out[i] = src[i] * (1.0f / 255.0f);
        return;
    }
    const Filter1D fx = make_triangle(W, out_w);
    const Filter1D fy = make_triangle(H, out_h);
    // horizontal pass: (H, W, 3) -> (H, out_w, 3)
    std::vector<float> tmp(size_t(H) * out_w * 3);
    for (int y = 0; y < H; y++) {
        const uint8_t* row = src + size_t(y) * W * 3;
        float* trow = tmp.data() + size_t(y) * out_w * 3;
        for (int ox = 0; ox < out_w; ox++) {
            const float* wt = fx.weights.data() + size_t(ox) * fx.ksize;
            const int x0 = fx.start[ox], n = fx.count[ox];
            float acc0 = 0, acc1 = 0, acc2 = 0;
            for (int k = 0; k < n; k++) {
                const uint8_t* p = row + size_t(x0 + k) * 3;
                acc0 += wt[k] * p[0];
                acc1 += wt[k] * p[1];
                acc2 += wt[k] * p[2];
            }
            trow[ox * 3 + 0] = acc0;
            trow[ox * 3 + 1] = acc1;
            trow[ox * 3 + 2] = acc2;
        }
    }
    // vertical pass: (H, out_w, 3) -> (out_h, out_w, 3), scaled to [0,1]
    for (int oy = 0; oy < out_h; oy++) {
        const float* wt = fy.weights.data() + size_t(oy) * fy.ksize;
        const int y0 = fy.start[oy], n = fy.count[oy];
        float* drow = out + size_t(oy) * out_w * 3;
        for (int j = 0; j < out_w * 3; j++) {
            float acc = 0;
            for (int k = 0; k < n; k++)
                acc += wt[k] * tmp[size_t(y0 + k) * out_w * 3 + j];
            drow[j] = acc * (1.0f / 255.0f);
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
