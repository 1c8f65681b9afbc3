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

}  // extern "C"
