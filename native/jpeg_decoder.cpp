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

// Read a 4:2:0 YCbCr JPEG's *quantized DCT coefficients* without any IDCT —
// libjpeg's jpeg_read_coefficients transcoding path. This is the zero-loss
// source for the engine's entropy-domain ingest (facedet_tpu/ops/jpeg_dct.py,
// input_format="dct420"): the coefficients the file stores go straight to the
// device, where dequant + IDCT run as MXU matmuls. Skips the host IDCT the
// RGB/YUV paths pay, and uploads ~97%-zero int8 AC planes the link compressor
// likes (BENCH.md round-3 ingest study).
//
// Output layout matches ops/jpeg_dct.py's DctImage (all row-major, blocks in
// natural order — libjpeg de-zigzags during entropy decode):
//   y_dc  [yb_h, yb_w]         int16   (DC, exact)
//   y_ac  [yb_h, yb_w, 64]     int8    (AC, slot 0 zeroed by caller prefill)
//   uv_dc [yb_h/2, yb_w/2, 2]  int16   (Cb=0, Cr=1)
//   uv_ac [yb_h/2, yb_w/2, 2, 64] int8
//   qy/qc [64]                 uint16  (natural order, per-file tables)
// yb_h/yb_w = MCU-padded luma block dims = ceil(dim/16)*16/8. Caller zero-fills
// the buffers; file blocks are written, dummy MCU-padding blocks stay zero.
// Returns 0 on success, -4 if not plain 4:2:0 YCbCr or Cb/Cr tables differ,
// -6 if any stored AC coefficient exceeds the int8 wire range (high-quality
// files with tiny quant steps) — the int8 planes would silently clip, so the
// caller falls back to RGB decode instead of shipping corrupted coefficients.
static int read_dct420_body(jpeg_decompress_struct& cinfo, short* y_dc,
                            signed char* y_ac, short* uv_dc,
                            signed char* uv_ac, unsigned short* qy,
                            unsigned short* qc, int yb_h, int yb_w) {
  // Shared body for the file and memory entry points: runs after
  // jpeg_read_header; the caller destroys cinfo (and closes any file).
  const bool is420 =
      cinfo.jpeg_color_space == JCS_YCbCr && cinfo.num_components == 3 &&
      cinfo.comp_info[0].h_samp_factor == 2 &&
      cinfo.comp_info[0].v_samp_factor == 2 &&
      cinfo.comp_info[1].h_samp_factor == 1 &&
      cinfo.comp_info[1].v_samp_factor == 1 &&
      cinfo.comp_info[2].h_samp_factor == 1 &&
      cinfo.comp_info[2].v_samp_factor == 1;
  if (!is420) return -4;
  jvirt_barray_ptr* coefs = jpeg_read_coefficients(&cinfo);
  if (!coefs) return -5;
  JQUANT_TBL* qt[3];
  for (int ci = 0; ci < 3; ++ci) {
    qt[ci] = cinfo.comp_info[ci].quant_table;
    if (!qt[ci]) {
      int n = cinfo.comp_info[ci].quant_tbl_no;
      qt[ci] = (n >= 0 && n < NUM_QUANT_TBLS) ? cinfo.quant_tbl_ptrs[n] : nullptr;
    }
    if (!qt[ci]) return -4;
  }
  for (int k = 0; k < 64; ++k) {
    // DctImage carries a single chroma table; mixed-table files fall back.
    if (qt[1]->quantval[k] != qt[2]->quantval[k]) return -4;
    qy[k] = qt[0]->quantval[k];
    qc[k] = qt[1]->quantval[k];
  }
  const int cb_h = yb_h / 2, cb_w = yb_w / 2;
  for (int ci = 0; ci < 3; ++ci) {
    jpeg_component_info* comp = &cinfo.comp_info[ci];
    const int samp = comp->v_samp_factor;  // 2 for Y, 1 for chroma
    const long rows_alloc =
        ((comp->height_in_blocks + samp - 1) / samp) * samp;
    const long cols_alloc =
        ((comp->width_in_blocks + comp->h_samp_factor - 1) /
         comp->h_samp_factor) * comp->h_samp_factor;
    const long out_rows = (ci == 0) ? yb_h : cb_h;
    const long out_cols = (ci == 0) ? yb_w : cb_w;
    const long nr = rows_alloc < out_rows ? rows_alloc : out_rows;
    const long nc = cols_alloc < out_cols ? cols_alloc : out_cols;
    for (long row = 0; row < nr; ++row) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          reinterpret_cast<j_common_ptr>(&cinfo), coefs[ci],
          static_cast<JDIMENSION>(row), 1, FALSE);
      for (long col = 0; col < nc; ++col) {
        const JCOEF* blk = rows[0][col];
        signed char* ac;
        if (ci == 0) {
          y_dc[row * yb_w + col] = blk[0];
          ac = y_ac + (row * yb_w + col) * 64;
        } else {
          const long base = (row * cb_w + col) * 2 + (ci - 1);
          uv_dc[base] = blk[0];
          ac = uv_ac + base * 64;
        }
        for (int k = 1; k < 64; ++k) {
          const int v = blk[k];
          if (v > 127 || v < -127) return -6;
          ac[k] = static_cast<signed char>(v);
        }
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  return 0;
}

int jpeg_read_dct420(const char* path, short* y_dc, signed char* y_ac,
                     short* uv_dc, signed char* uv_ac, unsigned short* qy,
                     unsigned short* qc, int yb_h, int yb_w) {
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
  const int rc = read_dct420_body(cinfo, y_dc, y_ac, uv_dc, uv_ac, qy, qc,
                                  yb_h, yb_w);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return rc;
}

// In-memory variants (libjpeg jpeg_mem_src) — the sources for MJPEG-AVI
// video frames (data/video.py embeds one JPEG per frame): frame coefficients
// flow to the device without ever touching the filesystem or a host IDCT.

int jpeg_dims_mem(const unsigned char* buf, long len, int* height, int* width,
                  int* channels) {
  jpeg_decompress_struct cinfo;
  ErrorCtx err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *height = static_cast<int>(cinfo.image_height);
  *width = static_cast<int>(cinfo.image_width);
  *channels = 3;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int jpeg_read_dct420_mem(const unsigned char* buf, long len, short* y_dc,
                         signed char* y_ac, short* uv_dc, signed char* uv_ac,
                         unsigned short* qy, unsigned short* qc, int yb_h,
                         int yb_w) {
  jpeg_decompress_struct cinfo;
  ErrorCtx err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  const int rc = read_dct420_body(cinfo, y_dc, y_ac, uv_dc, uv_ac, qy, qc,
                                  yb_h, yb_w);
  jpeg_destroy_decompress(&cinfo);
  return rc;
}

}  // extern "C" (template below; C wrappers re-exported after)

// Entropy-code DctImage-layout quantized coefficients into a real baseline
// JPEG file — libjpeg's jpeg_write_coefficients transcoding path, the mirror
// of jpeg_read_dct420. The source planes come from the TPU (device-side FDCT
// after super-resolution, ops/jpeg_dct.py::encode_dct420_device): the host
// never runs a DCT in either direction; it only entropy-codes. yb_h/yb_w are
// the MCU-padded luma block dims (= ceil(dim/16)*2); height/width the true
// pixel size written to the header. Returns 0 on success. Templated over the
// AC element type: int8 is the compact wire, int16 the "wide" wire for
// high-contrast SR outputs whose quantized AC exceeds int8 (JPEG baseline
// Huffman covers AC magnitudes to 1023, so the device encoder clips there).
template <typename AC>
static int write_dct420_impl(const char* path, const short* y_dc,
                             const AC* y_ac, const short* uv_dc,
                             const AC* uv_ac, const unsigned short* qy,
                             const unsigned short* qc, int yb_h, int yb_w,
                             int height, int width) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  jpeg_compress_struct cinfo;
  ErrorCtx err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jump)) {
    jpeg_destroy_compress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = static_cast<JDIMENSION>(width);
  cinfo.image_height = static_cast<JDIMENSION>(height);
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_YCbCr;
  jpeg_set_defaults(&cinfo);
  jpeg_set_colorspace(&cinfo, JCS_YCbCr);
  cinfo.comp_info[0].h_samp_factor = 2;
  cinfo.comp_info[0].v_samp_factor = 2;
  for (int ci = 1; ci < 3; ++ci) {
    cinfo.comp_info[ci].h_samp_factor = 1;
    cinfo.comp_info[ci].v_samp_factor = 1;
  }
  // install the caller's quant tables (slots 0=luma, 1=chroma — the
  // jpeg_set_defaults assignment of quant_tbl_no already matches)
  for (int t = 0; t < 2; ++t) {
    if (cinfo.quant_tbl_ptrs[t] == nullptr)
      cinfo.quant_tbl_ptrs[t] = jpeg_alloc_quant_table(
          reinterpret_cast<j_common_ptr>(&cinfo));
    const unsigned short* q = t == 0 ? qy : qc;
    for (int k = 0; k < 64; ++k) cinfo.quant_tbl_ptrs[t]->quantval[k] = q[k];
    cinfo.quant_tbl_ptrs[t]->sent_table = FALSE;
  }
  const int cb_h = yb_h / 2, cb_w = yb_w / 2;
  jvirt_barray_ptr coefs[3];
  for (int ci = 0; ci < 3; ++ci) {
    const int rows = ci == 0 ? yb_h : cb_h;
    const int cols = ci == 0 ? yb_w : cb_w;
    const int samp = ci == 0 ? 2 : 1;
    coefs[ci] = (*cinfo.mem->request_virt_barray)(
        reinterpret_cast<j_common_ptr>(&cinfo), JPOOL_IMAGE, FALSE,
        static_cast<JDIMENSION>(cols), static_cast<JDIMENSION>(rows),
        static_cast<JDIMENSION>(samp));
  }
  jpeg_write_coefficients(&cinfo, coefs);  // realizes the arrays
  for (int ci = 0; ci < 3; ++ci) {
    const int rows = ci == 0 ? yb_h : cb_h;
    const int cols = ci == 0 ? yb_w : cb_w;
    for (int row = 0; row < rows; ++row) {
      JBLOCKARRAY buf = (*cinfo.mem->access_virt_barray)(
          reinterpret_cast<j_common_ptr>(&cinfo), coefs[ci],
          static_cast<JDIMENSION>(row), 1, TRUE);
      for (int col = 0; col < cols; ++col) {
        JCOEF* blk = buf[0][col];
        if (ci == 0) {
          blk[0] = y_dc[row * yb_w + col];
          const AC* ac = y_ac + (static_cast<long>(row) * yb_w + col) * 64;
          for (int k = 1; k < 64; ++k) blk[k] = ac[k];
        } else {
          const long base = (static_cast<long>(row) * cb_w + col) * 2 + (ci - 1);
          blk[0] = uv_dc[base];
          const AC* ac = uv_ac + base * 64;
          for (int k = 1; k < 64; ++k) blk[k] = ac[k];
        }
      }
    }
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  std::fclose(f);
  return 0;
}

extern "C" {

int jpeg_write_dct420(const char* path, const short* y_dc,
                      const signed char* y_ac, const short* uv_dc,
                      const signed char* uv_ac, const unsigned short* qy,
                      const unsigned short* qc, int yb_h, int yb_w,
                      int height, int width) {
  return write_dct420_impl<signed char>(path, y_dc, y_ac, uv_dc, uv_ac, qy,
                                        qc, yb_h, yb_w, height, width);
}

int jpeg_write_dct420_wide(const char* path, const short* y_dc,
                           const short* y_ac, const short* uv_dc,
                           const short* uv_ac, const unsigned short* qy,
                           const unsigned short* qc, int yb_h, int yb_w,
                           int height, int width) {
  return write_dct420_impl<short>(path, y_dc, y_ac, uv_dc, uv_ac, qy, qc,
                                  yb_h, yb_w, height, width);
}

}  // extern "C"
