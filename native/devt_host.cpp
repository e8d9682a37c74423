// devt_host — native host-side data library for devt_tpu.
//
// The TPU-native equivalent of the reference's native data dependencies
// (SURVEY.md §2.7): NVIDIA DALI's fused decode→resize→crop→normalize
// pipeline (reference: src/dataloaders/mmx/MMX_Light_dl.py:80-102), the
// per-frame PIL/libjpeg decode in DataLoader workers
// (MMX_Frame_dl.py:101-104), and the Annoy ANN index over exported
// embeddings (src/data_processing/tools/nearest_neighbour.py:18-42).
//
// Everything is exposed through a C ABI consumed via ctypes
// (devt_tpu/native.py).  Batch entry points spawn std::thread workers so
// a host stays ahead of the TPU step loop.
//
// Build: make -C native    (g++ -O3 -shared, links libjpeg + libpng)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cfenv>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Decoders → RGB8
// ---------------------------------------------------------------------------

struct Image {
  std::vector<uint8_t> rgb;  // HWC, 3 channels
  int w = 0, h = 0;
  bool ok = false;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.rgb.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.rgb.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

Image decode_png(FILE* f) {
  Image img;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);           // palettes / low-bit-depth → 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  img.rgb.resize(size_t(img.w) * img.h * 3);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y)
    rows[y] = img.rgb.data() + size_t(y) * img.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return {};
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  Image img;
  if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    img = decode_png(f);
  }
  fclose(f);
  return img;
}

// ---------------------------------------------------------------------------
// Resize (bilinear, half-pixel centers) + center crop + normalize
// ---------------------------------------------------------------------------

// Windowed separable bilinear: computes only the output window
// [ox, ox+ow) x [oy, oy+oh) of the logical (nw, nh) resize — the fused
// paths pass the center-crop window so cropped-away rows/cols are never
// resized.  Per-pixel arithmetic is IDENTICAL to the naive formulation
// (h-lerp of u8-promoted floats, then v-lerp, then lround), so outputs
// are byte-identical to the pre-r5 loop; the restructuring hoists the
// per-pixel floor/clamp index math into per-column taps computed once,
// and the horizontal pass runs once per SOURCE row touched (rolling
// two-row cache) with clamp-free, fixed-stride inner loops the compiler
// vectorizes.  The r5 decode probe measured the naive loop — not the
// entropy decode — as the 224-crop wall (463 frames/s/core JPEG;
// raw MJPEG decode alone ran 2,128).
Image resize_bilinear_window(const Image& src, int nw, int nh,
                             int ox, int oy, int ow, int oh) {
  Image dst;
  dst.w = ow;
  dst.h = oh;
  dst.rgb.resize(size_t(ow) * oh * 3);
  const float sx = float(src.w) / nw, sy = float(src.h) / nh;
  std::vector<int> x0o(ow), x1o(ow);
  std::vector<float> wx(ow);
  for (int i = 0; i < ow; ++i) {
    float fx = (ox + i + 0.5f) * sx - 0.5f;
    int x0 = std::clamp(int(std::floor(fx)), 0, src.w - 1);
    int x1 = std::min(x0 + 1, src.w - 1);
    float w = fx - std::floor(fx);
    if (fx < 0) w = 0;
    x0o[i] = x0 * 3;
    x1o[i] = x1 * 3;
    wx[i] = w;
  }
  std::vector<float> rowa(size_t(ow) * 3), rowb(size_t(ow) * 3);
  int ya = -1, yb = -1;
  auto hpass = [&](int ys, float* dr) {
    const uint8_t* s = src.rgb.data() + size_t(ys) * src.w * 3;
    for (int i = 0; i < ow; ++i) {
      const uint8_t* p0 = s + x0o[i];
      const uint8_t* p1 = s + x1o[i];
      const float w = wx[i];
      dr[i * 3 + 0] = p0[0] + (p1[0] - p0[0]) * w;
      dr[i * 3 + 1] = p0[1] + (p1[1] - p0[1]) * w;
      dr[i * 3 + 2] = p0[2] + (p1[2] - p0[2]) * w;
    }
  };
  for (int j = 0; j < oh; ++j) {
    float fy = (oy + j + 0.5f) * sy - 0.5f;
    int y0 = std::clamp(int(std::floor(fy)), 0, src.h - 1);
    int y1 = std::min(y0 + 1, src.h - 1);
    float wy = fy - std::floor(fy);
    if (fy < 0) wy = 0;
    float* h0;
    if (y0 == ya) {
      h0 = rowa.data();
    } else if (y0 == yb) {
      h0 = rowb.data();
    } else {
      hpass(y0, rowa.data());
      ya = y0;
      h0 = rowa.data();
    }
    float* h1;
    if (y1 == ya) {
      h1 = rowa.data();
    } else if (y1 == yb) {
      h1 = rowb.data();
    } else {
      float* tgt = (h0 == rowa.data()) ? rowb.data() : rowa.data();
      hpass(y1, tgt);
      (tgt == rowa.data() ? ya : yb) = y1;
      h1 = tgt;
    }
    uint8_t* drow = dst.rgb.data() + size_t(j) * ow * 3;
    for (int i = 0; i < ow * 3; ++i) {
      float top = h0[i], bot = h1[i];
      drow[i] = uint8_t(std::lround(top + (bot - top) * wy));
    }
  }
  dst.ok = true;
  return dst;
}

Image resize_bilinear(const Image& src, int nw, int nh) {
  return resize_bilinear_window(src, nw, nh, 0, 0, nw, nh);
}

// shorter-side resize → center crop → normalize((v/255 - mean) / std)
// → f32 HWC (shared by the image and video fused paths)
int fuse_postprocess(const Image& img, int resize, int crop,
                     const float* mean, const float* stddev, float* out) {
  int nw, nh;
  if (img.w <= img.h) {
    nw = resize;
    nh = std::max(1, int(std::lround(double(img.h) * resize / img.w)));
  } else {
    nh = resize;
    nw = std::max(1, int(std::lround(double(img.w) * resize / img.h)));
  }
  // round-half-even center offsets (python round() semantics, which the
  // PIL/torchvision path uses for (size - crop) / 2.0); the resize
  // computes ONLY the crop window
  int left = int(std::nearbyint((nw - crop) / 2.0));
  int top = int(std::nearbyint((nh - crop) / 2.0));
  if (left < 0 || top < 0) return -2;
  Image r = resize_bilinear_window(img, nw, nh, left, top, crop, crop);
  for (int y = 0; y < crop; ++y) {
    const uint8_t* srow = r.rgb.data() + size_t(y) * crop * 3;
    float* drow = out + size_t(y) * crop * 3;
    for (int x = 0; x < crop * 3; x += 3) {
      drow[x + 0] = (srow[x + 0] / 255.0f - mean[0]) / stddev[0];
      drow[x + 1] = (srow[x + 1] / 255.0f - mean[1]) / stddev[1];
      drow[x + 2] = (srow[x + 2] / 255.0f - mean[2]) / stddev[2];
    }
  }
  return 0;
}

// one fused sample: decode → shorter-side resize → center crop →
// normalize((v/255 - mean) / std) → f32 HWC
int load_image_f32_impl(const char* path, int resize, int crop,
                        const float* mean, const float* stddev, float* out) {
  Image img = decode_file(path);
  if (!img.ok) return -1;
  return fuse_postprocess(img, resize, crop, mean, stddev, out);
}

// u8 wire-format variant: same shorter-side resize + center crop, but the
// (v/255 - mean)/std affine is deferred to the accelerator.  The resize
// already rounds to uint8 (resize_bilinear), so these are byte-identical
// to the pixels the f32 path normalizes — no extra quantization — while
// the host→device transfer moves 4x fewer bytes (the link, not the
// decode, is the e2e bottleneck on tunneled/PCIe-attached hosts).
int fuse_postprocess_u8(const Image& img, int resize, int crop,
                        uint8_t* out) {
  int nw, nh;
  if (img.w <= img.h) {
    nw = resize;
    nh = std::max(1, int(std::lround(double(img.h) * resize / img.w)));
  } else {
    nh = resize;
    nw = std::max(1, int(std::lround(double(img.w) * resize / img.h)));
  }
  int left = int(std::nearbyint((nw - crop) / 2.0));
  int top = int(std::nearbyint((nh - crop) / 2.0));
  if (left < 0 || top < 0) return -2;
  Image r = resize_bilinear_window(img, nw, nh, left, top, crop, crop);
  for (int y = 0; y < crop; ++y) {
    const uint8_t* srow = r.rgb.data() + size_t(y) * crop * 3;
    std::memcpy(out + size_t(y) * crop * 3, srow, size_t(crop) * 3);
  }
  return 0;
}

int load_image_u8_impl(const char* path, int resize, int crop,
                       uint8_t* out) {
  Image img = decode_file(path);
  if (!img.ok) return -1;
  return fuse_postprocess_u8(img, resize, crop, out);
}

// ---------------------------------------------------------------------------
// Video decode: MJPEG — raw concatenated-JPEG streams and MJPG-in-AVI.
//
// The reference decodes video by shelling out to ffmpeg
// (src/data_processing/transforms/spatio_cut.py:11-22); this image ships
// no ffmpeg/libav, so the library carries a first-party decoder for the
// one codec expressible with its bundled deps: Motion-JPEG (every frame a
// baseline JPEG, decoded with the libjpeg path above) in either a raw
// .mjpeg stream or a RIFF-AVI container ('movi' list, '##dc' chunks).
// ---------------------------------------------------------------------------

Image decode_jpeg_mem(const uint8_t* buf, size_t len) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.rgb.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.rgb.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

bool read_whole_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    fclose(f);
    return false;
  }
  out->resize(size_t(n));
  size_t got = fread(out->data(), 1, size_t(n), f);
  fclose(f);
  return got == size_t(n);
}

uint32_t rd_u32le(const uint8_t* p) {
  return uint32_t(p[0]) | uint32_t(p[1]) << 8 | uint32_t(p[2]) << 16 |
         uint32_t(p[3]) << 24;
}

// Collect (offset, size) spans of every JPEG frame in the file.
// AVI: walk the RIFF chunk tree to the 'movi' LIST and take '##dc'/'##db'
// chunks.  Raw MJPEG: split on SOI (FFD8FF) markers — legal because FF
// bytes inside entropy-coded data are always stuffed with 00.
void collect_frame_spans(const std::vector<uint8_t>& buf,
                         std::vector<std::pair<size_t, size_t>>* spans) {
  const size_t n = buf.size();
  if (n >= 12 && memcmp(buf.data(), "RIFF", 4) == 0 &&
      memcmp(buf.data() + 8, "AVI ", 4) == 0) {
    // iterative chunk walk: stack of (pos, end) regions of chunk lists
    std::vector<std::pair<size_t, size_t>> regions{{12, n}};
    while (!regions.empty()) {
      auto [pos, end] = regions.back();
      regions.pop_back();
      while (pos + 8 <= end) {
        const uint8_t* hdr = buf.data() + pos;
        uint32_t size = rd_u32le(hdr + 4);
        size_t data = pos + 8;
        if (data + size > n) break;
        if (memcmp(hdr, "LIST", 4) == 0 && size >= 4) {
          // descend into any LIST ('movi' holds the frames; 'rec ' can
          // nest them; other lists simply contain no ##dc chunks)
          regions.emplace_back(data + 4, data + size);
        } else if (size > 2 && hdr[2] == 'd' && (hdr[3] == 'c' ||
                                                 hdr[3] == 'b') &&
                   buf[data] == 0xFF && buf[data + 1] == 0xD8) {
          spans->emplace_back(data, size);
        }
        pos = data + size + (size & 1);  // chunks pad to even
      }
    }
    return;
  }
  // raw MJPEG stream
  size_t start = SIZE_MAX;
  for (size_t i = 0; i + 2 < n; ++i) {
    if (buf[i] == 0xFF && buf[i + 1] == 0xD8 && buf[i + 2] == 0xFF) {
      if (start != SIZE_MAX) spans->emplace_back(start, i - start);
      start = i;
    }
  }
  if (start != SIZE_MAX) spans->emplace_back(start, n - start);
}

// ---------------------------------------------------------------------------
// Exact ANN index (Annoy-equivalent for the retrieval tool)
// ---------------------------------------------------------------------------

struct AnnIndex {
  int dim;
  std::vector<float> data;  // n × dim
  int size() const { return int(data.size() / dim); }
};

}  // namespace

extern "C" {

// ---- image pipeline -------------------------------------------------------

// Fused single-image load; returns 0 on success.
int devt_load_image_f32(const char* path, int resize, int crop,
                        const float* mean, const float* stddev, float* out) {
  return load_image_f32_impl(path, resize, crop, mean, stddev, out);
}

// Threaded batch: n paths → out[n, crop, crop, 3] f32.  status[i] per image
// (0 ok; missing/corrupt images leave zeros — the pipeline's
// fault-tolerance contract, MMX_Temporal_dl.py:163-171).
int devt_load_batch_f32(const char** paths, int n, int resize, int crop,
                        const float* mean, const float* stddev, float* out,
                        int* status, int nthreads) {
  const size_t stride = size_t(crop) * crop * 3;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      float* dst = out + size_t(i) * stride;
      int rc = load_image_f32_impl(paths[i], resize, crop, mean, stddev, dst);
      if (rc != 0) std::memset(dst, 0, stride * sizeof(float));
      if (status) status[i] = rc;
    }
  };
  int nt = std::max(1, std::min(nthreads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// Threaded batch, u8 wire format: n paths → out[n, crop, crop, 3] u8.
// Same fault-tolerance contract as the f32 batch (failures leave zeros).
int devt_load_batch_u8(const char** paths, int n, int resize, int crop,
                       uint8_t* out, int* status, int nthreads) {
  const size_t stride = size_t(crop) * crop * 3;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      uint8_t* dst = out + size_t(i) * stride;
      int rc = load_image_u8_impl(paths[i], resize, crop, dst);
      if (rc != 0) std::memset(dst, 0, stride);
      if (status) status[i] = rc;
    }
  };
  int nt = std::max(1, std::min(nthreads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// Pre-patchified u8 wire: each image is emitted as (N_patches, p*p*3)
// ViT tokens instead of (crop, crop, 3) pixels — token feature order is
// (p1, p2, c) with c fastest, the layout the ViViT patch embed consumes
// (models/vivit.py patchify; the reference's einops Rearrange,
// src/models/vit.py:89-91).  The permutation is row-segment memcpys over
// bytes the loader is writing anyway — free at decode time — and it
// removes the device-side patchify relayout (~2 ms of a 19 ms 224**2
// ViViT train step) from the critical path.  Same bytes, same count:
// transfer cost is unchanged.
int devt_load_batch_u8_patches(const char** paths, int n, int resize,
                               int crop, int patch, uint8_t* out,
                               int* status, int nthreads) {
  if (patch <= 0 || crop % patch != 0) return -3;
  const int g = crop / patch;                 // patches per side
  const size_t tok_bytes = size_t(patch) * patch * 3;
  const size_t stride = size_t(g) * g * tok_bytes;
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<uint8_t> pix(size_t(crop) * crop * 3);
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      uint8_t* dst = out + size_t(i) * stride;
      int rc = load_image_u8_impl(paths[i], resize, crop, pix.data());
      if (rc != 0) {
        std::memset(dst, 0, stride);
      } else {
        for (int gh = 0; gh < g; ++gh)
          for (int gw = 0; gw < g; ++gw) {
            uint8_t* tok = dst + (size_t(gh) * g + gw) * tok_bytes;
            for (int p1 = 0; p1 < patch; ++p1) {
              const uint8_t* srow = pix.data() +
                  (size_t(gh * patch + p1) * crop + size_t(gw) * patch) * 3;
              std::memcpy(tok + size_t(p1) * patch * 3, srow,
                          size_t(patch) * 3);
            }
          }
      }
      if (status) status[i] = rc;
    }
  };
  int nt = std::max(1, std::min(nthreads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// Raw decode (RGB8) for callers that augment before normalize.
int devt_decode_image(const char* path, uint8_t* out, int max_bytes, int* w,
                      int* h) {
  Image img = decode_file(path);
  if (!img.ok) return -1;
  if (int(img.rgb.size()) > max_bytes) return -2;
  std::memcpy(out, img.rgb.data(), img.rgb.size());
  *w = img.w;
  *h = img.h;
  return 0;
}

// ---- video pipeline (MJPEG / MJPG-in-AVI) ---------------------------------

// Probe: frame count + dims of the first frame.  Returns 0 on success.
int devt_video_info(const char* path, int* n_frames, int* w, int* h) {
  std::vector<uint8_t> buf;
  if (!read_whole_file(path, &buf)) return -1;
  std::vector<std::pair<size_t, size_t>> spans;
  collect_frame_spans(buf, &spans);
  if (spans.empty()) return -2;
  Image first = decode_jpeg_mem(buf.data() + spans[0].first, spans[0].second);
  if (!first.ok) return -3;
  *n_frames = int(spans.size());
  *w = first.w;
  *h = first.h;
  return 0;
}

// Decode up to max_frames → out (n, h, w, 3) uint8 (dims from
// devt_video_info; frames with other dims are bilinear-resized to match).
// Returns frames written, or <0 on error.
int devt_video_decode_rgb8(const char* path, uint8_t* out, int max_frames,
                           int w, int h, int nthreads) {
  std::vector<uint8_t> buf;
  if (!read_whole_file(path, &buf)) return -1;
  std::vector<std::pair<size_t, size_t>> spans;
  collect_frame_spans(buf, &spans);
  int n = std::min<int>(int(spans.size()), max_frames);
  if (n <= 0) return -2;
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      Image img = decode_jpeg_mem(buf.data() + spans[i].first,
                                  spans[i].second);
      if (!img.ok) continue;
      if (img.w != w || img.h != h) img = resize_bilinear(img, w, h);
      memcpy(out + size_t(i) * w * h * 3, img.rgb.data(),
             size_t(w) * h * 3);
    }
  };
  int nt = std::max(1, std::min(nthreads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return n;
}

// Fused video decode: every frame → shorter-side resize → center crop →
// normalize → out (n, crop, crop, 3) f32.  Returns frames written.
int devt_video_decode_f32(const char* path, int resize, int crop,
                          const float* mean, const float* stddev, float* out,
                          int max_frames, int nthreads) {
  std::vector<uint8_t> buf;
  if (!read_whole_file(path, &buf)) return -1;
  std::vector<std::pair<size_t, size_t>> spans;
  collect_frame_spans(buf, &spans);
  int n = std::min<int>(int(spans.size()), max_frames);
  if (n <= 0) return -2;
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      Image img = decode_jpeg_mem(buf.data() + spans[i].first,
                                  spans[i].second);
      if (!img.ok) continue;
      fuse_postprocess(img, resize, crop, mean, stddev,
                       out + size_t(i) * crop * crop * 3);
    }
  };
  int nt = std::max(1, std::min(nthreads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return n;
}

int devt_image_dims(const char* path, int* w, int* h) {
  Image img = decode_file(path);
  if (!img.ok) return -1;
  *w = img.w;
  *h = img.h;
  return 0;
}

// ---- ANN index -------------------------------------------------------------

void* devt_ann_create(int dim) { return new AnnIndex{dim, {}}; }

void devt_ann_destroy(void* idx) { delete static_cast<AnnIndex*>(idx); }

void devt_ann_add(void* idx, const float* v) {
  auto* a = static_cast<AnnIndex*>(idx);
  a->data.insert(a->data.end(), v, v + a->dim);
}

int devt_ann_size(void* idx) { return static_cast<AnnIndex*>(idx)->size(); }

// Exact k-NN by Euclidean distance (the reference builds a 750-tree Annoy
// index over 15-d embeddings — at these dims exact search is both faster
// and exact, nearest_neighbour.py:24-32).
void devt_ann_query(void* idx, const float* q, int k, int* out_ids,
                    float* out_dists) {
  auto* a = static_cast<AnnIndex*>(idx);
  const int n = a->size(), d = a->dim;
  k = std::min(k, n);
  using Pair = std::pair<float, int>;
  std::priority_queue<Pair> heap;  // max-heap of the k best
  for (int i = 0; i < n; ++i) {
    const float* v = a->data.data() + size_t(i) * d;
    float dist = 0.0f;
    for (int j = 0; j < d; ++j) {
      float diff = v[j] - q[j];
      dist += diff * diff;
    }
    if (int(heap.size()) < k) {
      heap.emplace(dist, i);
    } else if (dist < heap.top().first) {
      heap.pop();
      heap.emplace(dist, i);
    }
  }
  for (int i = int(heap.size()) - 1; i >= 0; --i) {
    out_dists[i] = std::sqrt(heap.top().first);
    out_ids[i] = heap.top().second;
    heap.pop();
  }
}

int devt_ann_save(void* idx, const char* path) {
  auto* a = static_cast<AnnIndex*>(idx);
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  int n = a->size();
  fwrite(&a->dim, sizeof(int), 1, f);
  fwrite(&n, sizeof(int), 1, f);
  fwrite(a->data.data(), sizeof(float), a->data.size(), f);
  fclose(f);
  return 0;
}

void* devt_ann_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  int dim = 0, n = 0;
  if (fread(&dim, sizeof(int), 1, f) != 1 ||
      fread(&n, sizeof(int), 1, f) != 1) {
    fclose(f);
    return nullptr;
  }
  auto* a = new AnnIndex{dim, {}};
  a->data.resize(size_t(n) * dim);
  size_t got = fread(a->data.data(), sizeof(float), a->data.size(), f);
  fclose(f);
  if (got != a->data.size()) {
    delete a;
    return nullptr;
  }
  return a;
}

}  // extern "C"
