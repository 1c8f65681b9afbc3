// Native JPEG decoder — the data-loading hot path.
//
// The reference reads images with OpenCV's native imread everywhere
// (reference: utils/visualization.py:95-148, eval loops at
// eval/eval_official_widerface.py:168). TPU hosts have no cv2; instead of a
// pure-PIL loader this libjpeg-backed decoder keeps WIDERFACE eval IO native.
// Exposed via ctypes (facedet_tpu/data/native_loader.py); each call releases
// the GIL, so a Python thread pool gives genuinely parallel decodes.
#include <csetjmp>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrorCtx {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  ErrorCtx* ctx = reinterpret_cast<ErrorCtx*>(cinfo->err);
  longjmp(ctx->jump, 1);
}

}  // namespace

extern "C" {

// Read image dimensions without decoding. Returns 0 on success.
int jpeg_dims(const char* path, int* height, int* width, int* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  ErrorCtx err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *height = static_cast<int>(cinfo.image_height);
  *width = static_cast<int>(cinfo.image_width);
  *channels = 3;  // decoded as RGB below
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

// Decode into a caller-allocated [height*width*3] RGB uint8 buffer.
// Returns 0 on success, negative on error.
int jpeg_decode_rgb(const char* path, unsigned char* out, int height,
                    int width) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  ErrorCtx err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != height ||
      static_cast<int>(cinfo.output_width) != width ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -3;
  }
  const long stride = static_cast<long>(width) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + static_cast<long>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

// Decode a 4:2:0 YCbCr JPEG directly to planar YUV420 — libjpeg's raw-data
// path, skipping its chroma upsample and YCbCr->RGB conversion. The planes
// feed the TPU pipeline's low-bandwidth ingest (facedet_tpu/ops/color.py):
// 1.5 bytes/pixel uploaded instead of 3, converted on device.
//
// Caller allocates MCU-padded planes: y [padded_h * padded_w],
// cb/cr [padded_h/2 * padded_w/2] where padded_* = ceil(dim/16)*16.
// Returns 0 on success, -4 if the file is not plain 4:2:0 YCbCr (caller
// falls back to jpeg_decode_rgb + host subsample).
int jpeg_decode_yuv420(const char* path, unsigned char* y, unsigned char* cb,
                       unsigned char* cr, int padded_h, int padded_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  ErrorCtx err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  const bool is420 =
      cinfo.jpeg_color_space == JCS_YCbCr && cinfo.num_components == 3 &&
      cinfo.comp_info[0].h_samp_factor == 2 &&
      cinfo.comp_info[0].v_samp_factor == 2 &&
      cinfo.comp_info[1].h_samp_factor == 1 &&
      cinfo.comp_info[1].v_samp_factor == 1 &&
      cinfo.comp_info[2].h_samp_factor == 1 &&
      cinfo.comp_info[2].v_samp_factor == 1;
  if (!is420) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -4;
  }
  cinfo.raw_data_out = TRUE;
  cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&cinfo);
  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  if (padded_h < ((h + 15) / 16) * 16 || padded_w < ((w + 15) / 16) * 16) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -3;
  }
  const long yw = padded_w;
  const long cw = padded_w / 2;
  while (cinfo.output_scanline < cinfo.output_height) {
    const long base = cinfo.output_scanline;  // multiple of 16 (one iMCU row)
    JSAMPROW y_rows[16], cb_rows[8], cr_rows[8];
    for (int i = 0; i < 16; ++i) y_rows[i] = y + (base + i) * yw;
    for (int i = 0; i < 8; ++i) {
      cb_rows[i] = cb + (base / 2 + i) * cw;
      cr_rows[i] = cr + (base / 2 + i) * cw;
    }
    JSAMPARRAY planes[3] = {y_rows, cb_rows, cr_rows};
    if (jpeg_read_raw_data(&cinfo, planes, 16) == 0) {
      jpeg_destroy_decompress(&cinfo);
      std::fclose(f);
      return -5;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

}  // extern "C"
