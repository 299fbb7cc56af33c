// Native runtime for the host-bound compressibility reward.
//
// The reference computes JPEG sizes by PIL-encoding each candidate image in
// a sequential Python loop (edm/scorers.py:207-244). This library calls
// libjpeg directly (the same codec PIL wraps, so sizes match bit-for-bit
// given identical settings: quality-scaled Annex-K tables, 4:2:0 default
// subsampling, baseline Huffman) and fans the batch out across threads —
// the scorer callback's host time drops from ~ms/image to ~us/image.
//
// Build: make -C native   (g++ -O3 -shared -fPIC ... -ljpeg -pthread)
// ABI:
//   void dtts_jpeg_sizes(const uint8_t* images, int n, int h, int w, int c,
//                        int quality, int32_t* sizes_out, int n_threads);

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Compress one interleaved 8-bit image to memory; return compressed size.
long compress_one(const uint8_t* pixels, int h, int w, int c, int quality) {
  jpeg_compress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);

  unsigned char* buf = nullptr;
  unsigned long buf_size = 0;
  jpeg_mem_dest(&cinfo, &buf, &buf_size);

  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = c;
  cinfo.in_color_space = (c == 3) ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);

  const int stride = w * c;
  JSAMPROW row;
  while (cinfo.next_scanline < cinfo.image_height) {
    row = const_cast<JSAMPROW>(pixels + cinfo.next_scanline * stride);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  long size = static_cast<long>(buf_size);
  jpeg_destroy_compress(&cinfo);
  std::free(buf);
  return size;
}

}  // namespace

extern "C" {

void dtts_jpeg_sizes(const uint8_t* images, int n, int h, int w, int c,
                     int quality, int32_t* sizes_out, int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > n) n_threads = n;
  const long img_bytes = static_cast<long>(h) * w * c;

  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      sizes_out[i] = static_cast<int32_t>(
          compress_one(images + i * img_bytes, h, w, c, quality));
    }
  };
  if (n_threads == 1) {
    worker(0);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
}

// Version tag so the python side can detect stale binaries.
int dtts_native_abi_version() { return 1; }

}  // extern "C"
