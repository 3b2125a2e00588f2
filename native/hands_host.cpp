// hands_host: native host-side runtime for the hands_tpu data path.
//
// The TPU-native equivalent of the reference's cv2 (C++) dependency in the
// data loaders (/root/reference/common/data_utils.py uses cv2.imdecode /
// warpAffine / GaussianBlur from its 16 worker processes): image decode,
// affine warping and batch collation run here as tight C loops so the single
// host core keeps the TPU fed; everything geometric downstream happens on
// device (hands_tpu/ops/preprocess.py).
//
// Exposed as a C ABI consumed via ctypes (hands_tpu/utils/native.py).
//
// Build: make -C native   (g++ -O3, links libjpeg + libpng)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <algorithm>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------- jpeg
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Probe a JPEG's dimensions. Returns 0 on success.
int jpeg_probe(const uint8_t* buf, long len, int* out_h, int* out_w,
               int* out_c) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  *out_h = cinfo.image_height;
  *out_w = cinfo.image_width;
  *out_c = cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode a JPEG into a caller-allocated RGB uint8 buffer (h*w*3).
// Returns 0 on success.
int jpeg_decode_rgb(const uint8_t* buf, long len, uint8_t* out, int out_h,
                    int out_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != out_h || (int)cinfo.output_width != out_w) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const int stride = out_w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode a JPEG at reduced scale (libjpeg scale_num/scale_denom: the iDCT
// itself runs on fewer coefficients, ~denom^2 cheaper — the right way to
// feed a small on-device patch from large frames). denom in {1, 2, 4, 8}.
// out must hold ceil(h/denom) * ceil(w/denom) * 3 bytes; the actual output
// dims are written to out_h/out_w. Returns 0 on success.
int jpeg_decode_rgb_scaled(const uint8_t* buf, long len, uint8_t* out,
                           int denom, int cap_h, int cap_w, int* out_h,
                           int* out_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);
  const int oh = (int)cinfo.output_height;
  const int ow = (int)cinfo.output_width;
  if (oh > cap_h || ow > cap_w) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *out_h = oh;
  *out_w = ow;
  const int stride = ow * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ----------------------------------------------------------------- png
int png_decode_rgb(const uint8_t* buf, long len, uint8_t* out, int out_h,
                   int out_w) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, (size_t)len)) return 1;
  image.format = PNG_FORMAT_RGB;
  if ((int)image.height != out_h || (int)image.width != out_w) {
    png_image_free(&image);
    return 2;
  }
  if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) {
    png_image_free(&image);
    return 3;
  }
  return 0;
}

int png_probe(const uint8_t* buf, long len, int* out_h, int* out_w) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, (size_t)len)) return 1;
  *out_h = image.height;
  *out_w = image.width;
  png_image_free(&image);
  return 0;
}

// ------------------------------------------------------------- warping
// Inverse-map bilinear affine warp, zero border: for each dst pixel,
// src_xy = M @ [x, y, 1]. M is row-major 2x3. Matches
// hands_tpu.ops.preprocess.warp_affine(method="bilinear").
void warp_affine_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                             const float* M, uint8_t* dst, int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    const float sy_base = M[3] * 0 + M[4] * y + M[5];
    const float sx_base = M[0] * 0 + M[1] * y + M[2];
    for (int x = 0; x < dw; ++x) {
      const float sx = sx_base + M[0] * x;
      const float sy = sy_base + M[3] * x;
      const int x0 = (int)floorf(sx);
      const int y0 = (int)floorf(sy);
      const float fx = sx - x0;
      const float fy = sy - y0;
      uint8_t* px = dst + ((size_t)y * dw + x) * c;
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        const float w00 = (1 - fx) * (1 - fy), w01 = fx * (1 - fy);
        const float w10 = (1 - fx) * fy, w11 = fx * fy;
        const int xs[2] = {x0, x0 + 1};
        const int ys[2] = {y0, y0 + 1};
        const float ws[4] = {w00, w01, w10, w11};
        int k = 0;
        for (int dy = 0; dy < 2; ++dy)
          for (int dx = 0; dx < 2; ++dx, ++k) {
            const int xi = xs[dx], yi = ys[dy];
            if (xi >= 0 && xi < sw && yi >= 0 && yi < sh)
              acc += ws[k] * src[((size_t)yi * sw + xi) * c + ch];
          }
        px[ch] = (uint8_t)std::min(255.f, std::max(0.f, acc + 0.5f));
      }
    }
  }
}

// Warp + convert to float32 + per-channel normalize ((v/255 - mean) / std),
// fused in one pass. dst is (dh, dw, c) float32 NHWC.
void warp_affine_normalize_f32(const uint8_t* src, int sh, int sw, int c,
                               const float* M, float* dst, int dh, int dw,
                               const float* mean, const float* stdv) {
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      const float sx = M[0] * x + M[1] * y + M[2];
      const float sy = M[3] * x + M[4] * y + M[5];
      const int x0 = (int)floorf(sx);
      const int y0 = (int)floorf(sy);
      const float fx = sx - x0;
      const float fy = sy - y0;
      float* px = dst + ((size_t)y * dw + x) * c;
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        const float ws[4] = {(1 - fx) * (1 - fy), fx * (1 - fy),
                             (1 - fx) * fy, fx * fy};
        const int xs[2] = {x0, x0 + 1};
        const int ys[2] = {y0, y0 + 1};
        int k = 0;
        for (int dy = 0; dy < 2; ++dy)
          for (int dx = 0; dx < 2; ++dx, ++k) {
            const int xi = xs[dx], yi = ys[dy];
            if (xi >= 0 && xi < sw && yi >= 0 && yi < sh)
              acc += ws[k] * src[((size_t)yi * sw + xi) * c + ch];
          }
        px[ch] = (acc / 255.f - mean[ch]) / stdv[ch];
      }
    }
  }
}

// ------------------------------------------------------------- collate
// Stack N same-shape HWC uint8 images into one contiguous float32 NHWC
// buffer with scale (e.g. 1/255).
void stack_u8_to_f32(const uint8_t** imgs, int n, long hwc, float* out,
                     float scale) {
  for (int i = 0; i < n; ++i) {
    const uint8_t* src = imgs[i];
    float* dst = out + (size_t)i * hwc;
    for (long j = 0; j < hwc; ++j) dst[j] = src[j] * scale;
  }
}

}  // extern "C"
