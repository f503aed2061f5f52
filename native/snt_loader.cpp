// snt_loader — native data-path runtime for soccernerfs_tpu.
//
// TPU-native counterpart of the reference's data-loading hot paths: the
// CacheDataloader's thread-pooled PIL decode (ref: nerfstudio
// data/utils/dataloaders.py:186-206) and the importance pixel sampler's
// per-image multinomial (ref: data/pixel_samplers.py:383-411).  The host
// must keep the TPU fed; Python/PIL decode of a 2500-image cache refresh
// and NumPy weighted choice per step are the two host-side costs worth
// moving to native code.
//
// Exposed C ABI (ctypes-friendly):
//   snt_decode_batch     — N images -> float32 [N,H,W,3] RGB in [0,1],
//                          multithreaded libpng/libjpeg decode, RGBA
//                          composited over an alpha color.
//   snt_weighted_sample  — k draws from a float16/float32 weight map via
//                          inverse-CDF binary search (with/without
//                          replacement semantics matching numpy.choice use).
//   snt_uniform_sample   — k uniform (image,row,col) triples.
//
// Build: make -C native  (produces native/libsnt_loader.so)
#include <algorithm>
#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <random>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// image decode
// ---------------------------------------------------------------------------

static bool decode_png(const char* path, float* out, int H, int W,
                       const float alpha_color[3]) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int color_type = png_get_color_type(png, info);
  int bit_depth = png_get_bit_depth(png, info);

  // normalize to 8-bit RGBA
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_RGB || color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_PALETTE)
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
  png_read_update_info(png, info);

  if ((int)height != H || (int)width != W) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }

  std::vector<png_byte> row(width * 4);
  const float inv = 1.0f / 255.0f;
  for (png_uint_32 y = 0; y < height; y++) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + (size_t)y * W * 3;
    for (png_uint_32 x = 0; x < width; x++) {
      float a = row[x * 4 + 3] * inv;
      for (int c = 0; c < 3; c++) {
        float v = row[x * 4 + c] * inv;
        dst[x * 3 + c] = v * a + alpha_color[c] * (1.0f - a);
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

static bool decode_jpeg(const char* path, float* out, int H, int W) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != H || (int)cinfo.output_width != W) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  std::vector<JSAMPLE> row(cinfo.output_width * 3);
  JSAMPROW rows[1] = {row.data()};
  const float inv = 1.0f / 255.0f;
  while (cinfo.output_scanline < cinfo.output_height) {
    int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, rows, 1);
    float* dst = out + (size_t)y * W * 3;
    for (int x = 0; x < W * 3; x++) dst[x] = row[x] * inv;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

// Decode `n` images (paths as a \0-separated blob with offsets) into
// out[n*H*W*3].  Returns the number successfully decoded; failures leave
// zeros (caller may re-decode via the Python fallback).
int snt_decode_batch(const char* path_blob, const int64_t* path_offsets, int n,
                     float* out, int H, int W, const float* alpha_color,
                     int num_threads) {
  std::atomic<int> next(0), ok(0);
  float alpha[3] = {1.0f, 1.0f, 1.0f};
  if (alpha_color) memcpy(alpha, alpha_color, sizeof(alpha));
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const char* path = path_blob + path_offsets[i];
      float* dst = out + (size_t)i * H * W * 3;
      size_t len = strlen(path);
      // Case-insensitive extension check (.JPG/.JPEG are common).
      std::string ext(path + (len > 5 ? len - 5 : 0));
      for (auto& c : ext) c = (char)tolower((unsigned char)c);
      bool is_jpg = ext.size() >= 4 &&
                    (ext.compare(ext.size() - 4, 4, ".jpg") == 0 ||
                     ext == ".jpeg");
      bool good = is_jpg ? decode_jpeg(path, dst, H, W)
                         : decode_png(path, dst, H, W, alpha);
      if (good) ok.fetch_add(1);
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; i++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return ok.load();
}

// ---------------------------------------------------------------------------
// pixel sampling
// ---------------------------------------------------------------------------

// Inverse-CDF weighted sampling of k pixels from a float32 [H*W] map.
// replacement=0 performs rejection of duplicates up to 8k attempts then
// falls back to allowing them (matches numpy.choice(replace=...) use in
// the sampler closely enough for training).
int snt_weighted_sample(const float* weights, int64_t size, int k,
                        int replacement, uint64_t seed, int64_t* out_idx) {
  std::vector<double> cdf(size);
  double total = 0.0;
  for (int64_t i = 0; i < size; i++) {
    total += (double)weights[i];
    cdf[i] = total;
  }
  if (total <= 0.0) return 0;
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, total);
  std::vector<uint8_t> used;
  if (!replacement) used.assign(size, 0);
  int produced = 0, attempts = 0, max_attempts = k * 8 + 64;
  while (produced < k && attempts < max_attempts) {
    attempts++;
    double u = uni(rng);
    int64_t idx =
        std::lower_bound(cdf.begin(), cdf.end(), u) - cdf.begin();
    if (idx >= size) idx = size - 1;
    if (!replacement) {
      if (used[idx]) continue;
      used[idx] = 1;
    }
    out_idx[produced++] = idx;
  }
  // exhausted rejection budget: fill remaining with replacement
  while (produced < k) {
    double u = uni(rng);
    int64_t idx = std::lower_bound(cdf.begin(), cdf.end(), u) - cdf.begin();
    if (idx >= size) idx = size - 1;
    out_idx[produced++] = idx;
  }
  return produced;
}

// k uniform (image, row, col) triples into out[k*3].
void snt_uniform_sample(int num_images, int H, int W, int k, uint64_t seed,
                        int64_t* out) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> di(0, num_images - 1), dh(0, H - 1),
      dw(0, W - 1);
  for (int i = 0; i < k; i++) {
    out[i * 3 + 0] = di(rng);
    out[i * 3 + 1] = dh(rng);
    out[i * 3 + 2] = dw(rng);
  }
}

}  // extern "C"
