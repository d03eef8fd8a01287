// omnigs_tpu native data loader.
//
// The reference's data path is C++ (OpenCV imread + undistort + GPU upload,
// /root/reference/examples/train_360roam.cpp:186-196). This is its TPU-host
// equivalent: a libjpeg/libpng decoder with bilinear resize and a worker
// thread pool + prefetch queue, exposed through a minimal C API consumed via
// ctypes (omnigs_tpu/io/native_loader.py). Keeps image decode off the Python
// GIL so host input never stalls the device step.
//
// Build: native/build.sh → libomnigs_loader.so

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC uint8
};

// ---------------- JPEG ----------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------- PNG ----------------

struct PngReadCtx {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + n > ctx->len) {
    png_error(png, "eof");
    return;
  }
  memcpy(out, ctx->buf + ctx->pos, n);
  ctx->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  PngReadCtx ctx{buf, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const uint8_t* buf, size_t len, Image* out) {
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len, out);
  if (len >= 8 && !png_sig_cmp(buf, 0, 8)) return decode_png(buf, len, out);
  return decode_jpeg(buf, len, out) || decode_png(buf, len, out);
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t got = fread(out->data(), 1, n, f);
  fclose(f);
  return got == size_t(n);
}

// bilinear resize uint8 HWC3 → float32 HWC3 in [0,1]
void resize_to_float(const Image& src, int dw, int dh, float* dst) {
  const float sx = float(src.w) / dw;
  const float sy = float(src.h) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : int(fy);
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : int(fx);
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      const uint8_t* p00 = &src.data[(size_t(y0) * src.w + x0) * 3];
      const uint8_t* p01 = &src.data[(size_t(y0) * src.w + x1) * 3];
      const uint8_t* p10 = &src.data[(size_t(y1) * src.w + x0) * 3];
      const uint8_t* p11 = &src.data[(size_t(y1) * src.w + x1) * 3];
      float* o = dst + (size_t(y) * dw + x) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        float a = p00[ch] * (1 - wx) + p01[ch] * wx;
        float b = p10[ch] * (1 - wx) + p11[ch] * wx;
        o[ch] = (a * (1 - wy) + b * wy) * (1.0f / 255.0f);
      }
    }
  }
}

// ---------------- thread-pool loader ----------------

struct Job {
  int id;
  std::string path;
};

struct Result {
  int id;
  bool ok;
  std::vector<float> pixels;  // dh*dw*3
};

struct Loader {
  int dw, dh;
  std::vector<std::thread> workers;
  std::deque<Job> jobs;
  std::deque<Result> results;
  std::mutex mu;
  std::condition_variable cv_jobs, cv_results;
  std::atomic<bool> stop{false};

  Loader(int n_threads, int dw_, int dh_) : dw(dw_), dh(dh_) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { run(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> g(mu);
      stop = true;
    }
    cv_jobs.notify_all();
    for (auto& t : workers) t.join();
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> g(mu);
        cv_jobs.wait(g, [this] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      Result res;
      res.id = job.id;
      std::vector<uint8_t> raw;
      Image img;
      res.ok = read_file(job.path.c_str(), &raw) &&
               decode_any(raw.data(), raw.size(), &img);
      if (res.ok) {
        res.pixels.resize(size_t(dw) * dh * 3);
        resize_to_float(img, dw, dh, res.pixels.data());
      }
      {
        std::lock_guard<std::mutex> g(mu);
        results.push_back(std::move(res));
      }
      cv_results.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(int n_threads, int width, int height) {
  return new Loader(n_threads, width, height);
}

void loader_destroy(void* h) { delete static_cast<Loader*>(h); }

void loader_submit(void* h, const char* path, int id) {
  auto* l = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> g(l->mu);
    l->jobs.push_back(Job{id, path});
  }
  l->cv_jobs.notify_one();
}

// Blocking fetch of one finished image into dst (dh*dw*3 floats).
// Returns the job id, or -1 on decode failure (id in *fail_id).
int loader_fetch(void* h, float* dst) {
  auto* l = static_cast<Loader*>(h);
  Result res;
  {
    std::unique_lock<std::mutex> g(l->mu);
    l->cv_results.wait(g, [l] { return !l->results.empty(); });
    res = std::move(l->results.front());
    l->results.pop_front();
  }
  if (!res.ok) return -1 - res.id;
  memcpy(dst, res.pixels.data(), res.pixels.size() * sizeof(float));
  return res.id;
}

// One-shot synchronous decode+resize. Returns 0 on success.
int decode_image(const char* path, float* dst, int width, int height) {
  std::vector<uint8_t> raw;
  Image img;
  if (!read_file(path, &raw) || !decode_any(raw.data(), raw.size(), &img))
    return 1;
  resize_to_float(img, width, height, dst);
  return 0;
}

}  // extern "C"
