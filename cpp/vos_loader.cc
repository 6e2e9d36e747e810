// Native host-side frame loader for the VOS data pipeline.
//
// The reference's decode path is OpenCV (C++) JPEG/PNG decode inside torch
// DataLoader worker processes (/root/reference/src/data/vos_dataset.py:233,
// custom_transforms.py — SURVEY.md §2.4 native-dependency table). This
// library supplies the same native capability for the TPU rebuild without
// the process-pool machinery: libjpeg/libpng decoders plus a pthread
// prefetch pool that decodes a submitted file list into a preallocated slot
// ring while the device computes. Exposed as a plain C ABI consumed from
// Python via ctypes (e_osvos_tpu/data/native.py).
//
// Build: make -C cpp   (g++ -O3 -shared -fPIC, links -ljpeg -lpng)

#include <stddef.h>
#include <stdio.h>

#include <jpeglib.h>
#include <png.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decode (RGB, 8-bit). Returns 0 on success; fills *h, *w and writes
// into out (caller-allocated, h*w*3 bytes). If out == NULL, only probes the
// dimensions.
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

int vos_decode_jpeg_cap(const char* path, uint8_t* out, int* h, int* w,
                        long cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  if (out == nullptr) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  if (cap >= 0 && (long)cinfo.output_height * cinfo.output_width * 3 > cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -4;  // output exceeds caller buffer
  }
  int stride = cinfo.output_width * cinfo.output_components;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Indexed PNG decode: returns the palette INDICES (object ids), matching the
// reference's PIL palette handling (vos_dataset.py:63,236-242). Grayscale
// PNGs decode to their 8-bit values. Returns 0 on success.
// ---------------------------------------------------------------------------

int vos_decode_png_indexed_cap(const char* path, uint8_t* out, int* h,
                               int* w, long cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_byte header[8];
  if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(f);
    return -2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -3;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  *h = (int)height;
  *w = (int)width;
  if (out == nullptr) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
  }
  if (cap >= 0 && (long)height * width > cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -4;  // output exceeds caller buffer
  }
  // keep palette indices: expand sub-byte depths to 1 byte per pixel but do
  // NOT expand palette to RGB
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE || color == PNG_COLOR_TYPE_GRAY) {
    if (depth < 8) png_set_packing(png);
  } else {
    // RGB(A) label PNGs are not id maps; convert to gray as a fallback
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  }
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; y++)
    rows[y] = out + (size_t)y * width;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

int vos_decode_jpeg(const char* path, uint8_t* out, int* h, int* w) {
  return vos_decode_jpeg_cap(path, out, h, w, -1);
}

int vos_decode_png_indexed(const char* path, uint8_t* out, int* h, int* w) {
  return vos_decode_png_indexed_cap(path, out, h, w, -1);
}

// ---------------------------------------------------------------------------
// Prefetch pool: N worker threads decode submitted files into caller-owned
// slot buffers. The host pipeline submits the next window's frames, lets the
// device compute, then waits on the slots it needs.
// ---------------------------------------------------------------------------

struct Job {
  std::string path;
  uint8_t* out;
  int kind;  // 0 = jpeg RGB, 1 = indexed png
  int slot;
  long cap;  // caller buffer capacity in bytes (-1 = unchecked)
};

struct Loader {
  std::vector<std::thread> workers;
  std::deque<Job> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable done_cv;
  std::vector<std::atomic<int>> status;  // per-slot: 0 idle/queued, 1 ok, <0 err
  std::vector<int> dims;                 // per-slot h,w pairs
  bool stop = false;

  explicit Loader(int num_threads, int num_slots)
      : status(num_slots), dims(2 * num_slots) {
    for (auto& s : status) s.store(0);
    for (int i = 0; i < num_threads; i++)
      workers.emplace_back([this] { run(); });
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = std::move(queue.front());
        queue.pop_front();
      }
      int h = 0, w = 0, rc;
      if (job.kind == 0)
        rc = vos_decode_jpeg_cap(job.path.c_str(), job.out, &h, &w, job.cap);
      else
        rc = vos_decode_png_indexed_cap(job.path.c_str(), job.out, &h, &w,
                                        job.cap);
      dims[2 * job.slot] = h;
      dims[2 * job.slot + 1] = w;
      status[job.slot].store(rc == 0 ? 1 : rc);
      done_cv.notify_all();
    }
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& t : workers) t.join();
  }
};

void* vos_loader_create(int num_threads, int num_slots) {
  return new Loader(num_threads, num_slots);
}

void vos_loader_destroy(void* loader) { delete static_cast<Loader*>(loader); }

// Submit a decode into `slot`; `out` must stay valid until the slot reports
// done. kind: 0 jpeg, 1 indexed png. `cap` bounds the bytes written (-1 =
// unchecked; the capped form refuses frames larger than the slot buffer).
void vos_loader_submit_cap(void* loader, const char* path, uint8_t* out,
                           int kind, int slot, long cap) {
  Loader* l = static_cast<Loader*>(loader);
  l->status[slot].store(0);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->queue.push_back(Job{path, out, kind, slot, cap});
  }
  l->cv.notify_one();
}

void vos_loader_submit(void* loader, const char* path, uint8_t* out, int kind,
                       int slot) {
  vos_loader_submit_cap(loader, path, out, kind, slot, -1);
}

// Block until `slot` finishes; returns 1 ok / negative error. Fills h/w.
int vos_loader_wait(void* loader, int slot, int* h, int* w) {
  Loader* l = static_cast<Loader*>(loader);
  std::unique_lock<std::mutex> lk(l->mu);
  l->done_cv.wait(lk, [&] { return l->status[slot].load() != 0; });
  *h = l->dims[2 * slot];
  *w = l->dims[2 * slot + 1];
  return l->status[slot].load();
}

}  // extern "C"
