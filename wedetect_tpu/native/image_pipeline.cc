// Native host image pipeline: JPEG decode + keep-ratio resize +
// letterbox, fused into one call (no intermediate Python copies).
//
// Replaces the hot host path of the eval/input loaders
// (data/loader.py: cv2.imread + ops/letterbox.preprocess_image).
// Semantics mirror the reference test pipeline
// (wedetect/datasets/transformers/transforms.py:94-124, 180-275):
//   - keep-ratio resize by r = min(t/max, t/min): AREA when
//     downscaling, BILINEAR when upscaling,
//   - second-stage bilinear to the rounded letter size,
//   - center pad with 114, top = round(pad_h//2 - 0.1).
// Resampling uses float accumulation; cv2's fixed-point kernels may
// differ by +-1 LSB per pixel (tests compare with that tolerance —
// the arithmetic outputs sf/pad/ori are exact).
//
// Threading stays in Python: ctypes releases the GIL, so a
// ThreadPoolExecutor over these calls decodes in parallel.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct JerrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jerr_exit(j_common_ptr cinfo) {
  JerrMgr* err = reinterpret_cast<JerrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// EXIF orientation (1-8) from the JPEG APP1 segment; 1 when absent
// or unparseable. cv2.imread applies this tag, so the native decoder
// must too — otherwise phone photos come out rotated.
int exif_orientation(const uint8_t* buf, size_t len) {
  if (len < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return 1;
  size_t i = 2;
  while (i + 4 <= len) {
    if (buf[i] != 0xFF) return 1;
    uint8_t m = buf[i + 1];
    if (m == 0xFF) {  // legal fill byte before a marker
      i += 1;
      continue;
    }
    if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) {
      i += 2;
      continue;
    }
    if (m == 0xDA) return 1;  // start of scan: no APP1 seen
    size_t seglen = (size_t(buf[i + 2]) << 8) | buf[i + 3];
    if (seglen < 2 || i + 2 + seglen > len) return 1;
    if (m == 0xE1 && seglen >= 16
        && !std::memcmp(buf + i + 4, "Exif\0\0", 6)) {
      const uint8_t* t = buf + i + 10;  // TIFF header
      size_t tlen = seglen - 8;
      bool le;
      if (t[0] == 'I' && t[1] == 'I') le = true;
      else if (t[0] == 'M' && t[1] == 'M') le = false;
      else return 1;
      auto rd16 = [&](size_t o) -> uint32_t {
        return le ? (t[o] | (uint32_t(t[o + 1]) << 8))
                  : ((uint32_t(t[o]) << 8) | t[o + 1]);
      };
      auto rd32 = [&](size_t o) -> uint32_t {
        return le ? (t[o] | (uint32_t(t[o + 1]) << 8)
                     | (uint32_t(t[o + 2]) << 16)
                     | (uint32_t(t[o + 3]) << 24))
                  : ((uint32_t(t[o]) << 24) | (uint32_t(t[o + 1]) << 16)
                     | (uint32_t(t[o + 2]) << 8) | t[o + 3]);
      };
      if (tlen < 8) return 1;
      uint32_t ifd = rd32(4);
      // 64-bit compare: a crafted ifd near UINT32_MAX must not wrap
      if (size_t(ifd) + 2 > tlen) return 1;
      uint32_t n = rd16(ifd);
      for (uint32_t e = 0; e < n; ++e) {
        size_t off = size_t(ifd) + 2 + size_t(e) * 12;
        if (off + 12 > tlen) return 1;
        if (rd16(off) == 0x0112) {
          uint32_t v = rd16(off + 8);
          return (v >= 1 && v <= 8) ? int(v) : 1;
        }
      }
      return 1;
    }
    i += 2 + seglen;
  }
  return 1;
}

// Re-orient an RGB buffer upright (same convention as cv2.imread:
// orientation 6 -> rotate 90 CW, 8 -> 90 CCW, 3 -> 180, 2/4/5/7
// mirrored variants).
void apply_orientation(std::vector<uint8_t>* img, int* h, int* w,
                       int orient) {
  if (orient <= 1) return;
  int H = *h, W = *w;
  bool swap = orient >= 5;
  int oh = swap ? W : H, ow = swap ? H : W;
  std::vector<uint8_t> dst(size_t(oh) * ow * 3);
  const uint8_t* s = img->data();
  for (int y = 0; y < oh; ++y) {
    uint8_t* d = dst.data() + size_t(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      int sy, sx;
      switch (orient) {
        case 2: sy = y; sx = W - 1 - x; break;          // mirror H
        case 3: sy = H - 1 - y; sx = W - 1 - x; break;  // 180
        case 4: sy = H - 1 - y; sx = x; break;          // mirror V
        case 5: sy = x; sx = y; break;                  // transpose
        case 6: sy = H - 1 - x; sx = y; break;          // 90 CW
        case 7: sy = H - 1 - x; sx = W - 1 - y; break;  // transverse
        default: sy = x; sx = W - 1 - y; break;         // 8: 90 CCW
      }
      std::memcpy(d + size_t(x) * 3, s + (size_t(sy) * W + sx) * 3, 3);
    }
  }
  img->swap(dst);
  *h = oh;
  *w = ow;
}

// Decode JPEG bytes to RGB at 1/denom scale (denom in {1,2,4,8}:
// libjpeg IDCT-scaled decode — the DCT blocks are reduced during the
// inverse transform, so a 1/denom decode costs ~1/denom^2 of the IDCT
// and color-convert work and touches 1/denom^2 of the output bytes).
// Returns 0 on success.
// `orient`: EXIF orientation if already parsed, or -1 to detect here.
int decode_jpeg_scaled(const uint8_t* buf, size_t len,
                       std::vector<uint8_t>* out, int* h, int* w,
                       int denom, int orient = -1) {
  jpeg_decompress_struct cinfo;
  JerrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize(size_t(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (orient < 0) orient = exif_orientation(buf, len);
  apply_orientation(out, h, w, orient);
  return 0;
}

int decode_jpeg(const uint8_t* buf, size_t len, std::vector<uint8_t>* out,
                int* h, int* w) {
  return decode_jpeg_scaled(buf, len, out, h, w, 1);
}

// Header-only dims (pre-orientation). Returns 0 on success.
int jpeg_header_dims(const uint8_t* buf, size_t len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JerrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Bilinear resize (pixel-center alignment, float weights, RGB u8).
void resize_bilinear(const uint8_t* src, int h, int w, uint8_t* dst,
                     int nh, int nw) {
  const double sy = double(h) / nh, sx = double(w) / nw;
  std::vector<int> x0(nw), x1(nw);
  std::vector<float> fx(nw);
  for (int x = 0; x < nw; ++x) {
    double s = (x + 0.5) * sx - 0.5;
    int i = int(std::floor(s));
    double f = s - i;
    if (i < 0) { i = 0; f = 0.0; }
    if (i >= w - 1) { i = w - 2 >= 0 ? w - 2 : 0; f = w > 1 ? 1.0 : 0.0; }
    x0[x] = i; x1[x] = w > 1 ? i + 1 : i; fx[x] = float(f);
  }
  for (int y = 0; y < nh; ++y) {
    double s = (y + 0.5) * sy - 0.5;
    int j = int(std::floor(s));
    double f = s - j;
    if (j < 0) { j = 0; f = 0.0; }
    if (j >= h - 1) { j = h - 2 >= 0 ? h - 2 : 0; f = h > 1 ? 1.0 : 0.0; }
    int j1 = h > 1 ? j + 1 : j;
    const uint8_t* r0 = src + size_t(j) * w * 3;
    const uint8_t* r1 = src + size_t(j1) * w * 3;
    uint8_t* d = dst + size_t(y) * nw * 3;
    float fy = float(f);
    for (int x = 0; x < nw; ++x) {
      const uint8_t* a = r0 + x0[x] * 3;
      const uint8_t* b = r0 + x1[x] * 3;
      const uint8_t* c = r1 + x0[x] * 3;
      const uint8_t* e = r1 + x1[x] * 3;
      float wx = fx[x];
      for (int ch = 0; ch < 3; ++ch) {
        float top = a[ch] + (b[ch] - a[ch]) * wx;
        float bot = c[ch] + (e[ch] - c[ch]) * wx;
        float v = top + (bot - top) * fy;
        d[x * 3 + ch] = uint8_t(std::lround(std::min(255.f,
                                                     std::max(0.f, v))));
      }
    }
  }
}

// Integer-ratio area downscale: plain ky x kx box average (u32
// accumulate, no per-pixel weight tables). Exactly the generic path's
// result for integer ratios, ~4x faster.
void resize_area_int(const uint8_t* src, int h, int w, uint8_t* dst,
                     int nh, int nw, int ky, int kx) {
  const uint32_t area = uint32_t(ky) * kx;
  const uint32_t half = area / 2;
  for (int y = 0; y < nh; ++y) {
    uint8_t* d = dst + size_t(y) * nw * 3;
    const uint8_t* base = src + size_t(y) * ky * w * 3;
    for (int x = 0; x < nw; ++x) {
      uint32_t r = 0, g = 0, b = 0;
      const uint8_t* p0 = base + size_t(x) * kx * 3;
      for (int j = 0; j < ky; ++j) {
        const uint8_t* p = p0 + size_t(j) * w * 3;
        for (int i = 0; i < kx; ++i) {
          r += p[i * 3];
          g += p[i * 3 + 1];
          b += p[i * 3 + 2];
        }
      }
      d[x * 3] = uint8_t((r + half) / area);
      d[x * 3 + 1] = uint8_t((g + half) / area);
      d[x * 3 + 2] = uint8_t((b + half) / area);
    }
  }
}

// Area resize for downscale (contribution-weighted average like
// cv2.INTER_AREA's generic path).
void resize_area(const uint8_t* src, int h, int w, uint8_t* dst,
                 int nh, int nw) {
  if (h % nh == 0 && w % nw == 0) {
    resize_area_int(src, h, w, dst, nh, nw, h / nh, w / nw);
    return;
  }
  const double sy = double(h) / nh, sx = double(w) / nw;
  // per-output-column source spans and weights
  struct Span { int start; int n; };
  std::vector<Span> xs(nw);
  std::vector<std::vector<float>> xw(nw);
  for (int x = 0; x < nw; ++x) {
    double a = x * sx, b = (x + 1) * sx;
    int ia = int(std::floor(a)), ib = std::min(int(std::ceil(b)), w);
    xs[x].start = ia;
    xs[x].n = ib - ia;
    xw[x].resize(xs[x].n);
    for (int i = 0; i < xs[x].n; ++i) {
      double l = std::max(a, double(ia + i));
      double r = std::min(b, double(ia + i + 1));
      xw[x][i] = float(std::max(0.0, r - l) / sx);
    }
  }
  std::vector<float> acc(size_t(nw) * 3);
  for (int y = 0; y < nh; ++y) {
    double a = y * sy, b = (y + 1) * sy;
    int ja = int(std::floor(a)), jb = std::min(int(std::ceil(b)), h);
    uint8_t* d = dst + size_t(y) * nw * 3;
    std::fill(acc.begin(), acc.end(), 0.f);
    for (int j = ja; j < jb; ++j) {
      double l = std::max(a, double(j));
      double r = std::min(b, double(j + 1));
      float wy = float(std::max(0.0, r - l) / sy);
      const uint8_t* row = src + size_t(j) * w * 3;
      for (int x = 0; x < nw; ++x) {
        const auto& wx = xw[x];
        const uint8_t* p = row + xs[x].start * 3;
        float r0 = 0.f, g0 = 0.f, b0 = 0.f;
        for (int i = 0; i < xs[x].n; ++i) {
          float f = wx[i];
          r0 += f * p[i * 3];
          g0 += f * p[i * 3 + 1];
          b0 += f * p[i * 3 + 2];
        }
        acc[x * 3] += wy * r0;
        acc[x * 3 + 1] += wy * g0;
        acc[x * 3 + 2] += wy * b0;
      }
    }
    for (int x = 0; x < nw * 3; ++x)
      d[x] = uint8_t(std::lround(std::min(255.f, std::max(0.f, acc[x]))));
  }
}

void resize_rgb(const uint8_t* src, int h, int w, uint8_t* dst,
                int nh, int nw) {
  if (nh < h || nw < w)
    resize_area(src, h, w, dst, nh, nw);
  else
    resize_bilinear(src, h, w, dst, nh, nw);
}

// Shared decode + keep-ratio + letterbox implementation.  When `fast`
// is set and the keep-ratio target is >=2x smaller than the source,
// the JPEG is decoded at the largest 1/{2,4,8} IDCT scale that still
// covers the target, and the remaining <2x step uses the normal area
// kernel.  This cuts decode time ~denom^2-fold on large inputs at the
// cost of a small, bounded numeric deviation vs the full-res path
// (the IDCT box low-pass vs area averaging of full-res pixels;
// pinned by tests/test_native_loader.py with tolerance).
int decode_letterbox_impl(const uint8_t* buf, size_t len, int th, int tw,
                          int pad_val, bool fast, uint8_t* out, float* sf,
                          float* pad, int* ori) {
  int denom = 1, fh = 0, fw = 0, orient = -1;
  if (fast) {
    if (jpeg_header_dims(buf, len, &fh, &fw)) return 1;
    orient = exif_orientation(buf, len);
    // oriented full-res dims drive the keep-ratio math
    int oh = orient >= 5 ? fw : fh, ow = orient >= 5 ? fh : fw;
    double ratio = std::min(double(std::max(th, tw)) / std::max(oh, ow),
                            double(std::min(th, tw)) / std::min(oh, ow));
    if (ratio < 1.0) {
      int rh = int(oh * ratio), rw = int(ow * ratio);
      // pre-orientation targets for the decode-scale decision
      int trh = orient >= 5 ? rw : rh, trw = orient >= 5 ? rh : rw;
      for (int d : {8, 4, 2}) {
        if ((fh + d - 1) / d >= trh && (fw + d - 1) / d >= trw) {
          denom = d;
          break;
        }
      }
    }
  }

  std::vector<uint8_t> img;
  int h, w;
  if (decode_jpeg_scaled(buf, len, &img, &h, &w, denom, orient))
    return 1;
  // full-res oriented dims: the scale/pad arithmetic below must be
  // identical to the exact path, so recover them when denom > 1
  int h0 = h, w0 = w;
  if (denom != 1) {
    h0 = orient >= 5 ? fw : fh;
    w0 = orient >= 5 ? fh : fw;
  }
  ori[0] = h0;
  ori[1] = w0;

  // stage 1: keep-ratio (allow_scale_up=True), truncated int sizes
  double ratio = std::min(double(std::max(th, tw)) / std::max(h0, w0),
                          double(std::min(th, tw)) / std::min(h0, w0));
  int rh = h0, rw = w0;
  if (ratio != 1.0) {
    rh = int(h0 * ratio);
    rw = int(w0 * ratio);
  }
  std::vector<uint8_t> stage1;
  const uint8_t* cur = img.data();
  if (rh != h || rw != w) {   // no-op when scaled decode hit target
    stage1.resize(size_t(rh) * rw * 3);
    resize_rgb(cur, h, w, stage1.data(), rh, rw);
    cur = stage1.data();
  }

  // stage 2: letterbox (allow_scale_up=False), rounded sizes, bilinear
  double r2 = std::min(std::min(double(th) / rh, double(tw) / rw), 1.0);
  // nearbyint: ties-to-even like Python round() (lround would give
  // half-away and shift the letterbox by 1 px at exact .5 sizes)
  int nh = int(std::nearbyint(rh * r2)), nw = int(std::nearbyint(rw * r2));
  std::vector<uint8_t> stage2;
  if (nh != rh || nw != rw) {
    stage2.resize(size_t(nh) * nw * 3);
    resize_bilinear(cur, rh, rw, stage2.data(), nh, nw);
    cur = stage2.data();
  }
  int pad_h = th - nh, pad_w = tw - nw;
  int top = int(std::lround(pad_h / 2 - 0.1));
  int left = int(std::lround(pad_w / 2 - 0.1));
  if (top < 0) top = 0;
  if (left < 0) left = 0;
  pad[0] = float(top);
  pad[1] = float(pad_h - top);
  pad[2] = float(left);
  pad[3] = float(pad_w - left);
  // preprocess_image composes the two stage ratios (== nw/w0, nh/h0)
  sf[0] = float((double(nw) / rw) * (double(rw) / w0));
  sf[1] = float((double(nh) / rh) * (double(rh) / h0));

  std::memset(out, pad_val, size_t(th) * tw * 3);
  for (int y = 0; y < nh; ++y)
    std::memcpy(out + (size_t(y + top) * tw + left) * 3,
                cur + size_t(y) * nw * 3, size_t(nw) * 3);
  return 0;
}

}  // namespace

extern "C" {

// Decode + keep-ratio + letterbox. out must hold th*tw*3 bytes.
// sf: (w_ratio, h_ratio); pad: (top, bottom, left, right);
// ori: (h, w). Returns 0 on success, nonzero on decode failure.
int wd_decode_letterbox(const uint8_t* buf, size_t len, int th, int tw,
                        int pad_val, uint8_t* out, float* sf,
                        float* pad, int* ori) {
  return decode_letterbox_impl(buf, len, th, tw, pad_val, false, out,
                               sf, pad, ori);
}

// Same contract, but engages DCT-scaled (1/2, 1/4, 1/8) decode for
// >=2x downscales (VERDICT r2 item 7). Numerically close to, but not
// bit-identical with, wd_decode_letterbox on engaged inputs.
int wd_decode_letterbox_fast(const uint8_t* buf, size_t len, int th,
                             int tw, int pad_val, uint8_t* out,
                             float* sf, float* pad, int* ori) {
  return decode_letterbox_impl(buf, len, th, tw, pad_val, true, out,
                               sf, pad, ori);
}

// Plain decode to RGB (h*w*3). Call wd_jpeg_info first for sizes.
int wd_jpeg_info(const uint8_t* buf, size_t len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JerrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  if (exif_orientation(buf, len) >= 5) std::swap(*h, *w);
  return 0;
}

int wd_decode_jpeg(const uint8_t* buf, size_t len, uint8_t* out) {
  std::vector<uint8_t> img;
  int h, w;
  if (decode_jpeg(buf, len, &img, &h, &w)) return 1;
  std::memcpy(out, img.data(), img.size());
  return 0;
}

}  // extern "C"
