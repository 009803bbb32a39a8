// Native IO runtime for sparse_videogen_tpu.
//
// TPU-native counterpart of the reference's native runtime layer (the
// reference uses C++/CUDA for its hot kernels; on TPU those are Pallas, so
// the native layer here covers the host-side runtime instead):
//   - svt_pread_parallel: threaded pread into a caller buffer. Loading a
//     14B checkpoint (~28 GB of safetensors) through Python file objects is
//     single-stream; N threads keep NVMe/page-cache saturated.
//   - svt_write_y4m: RGB -> YUV420 (BT.601) Y4M writer for the pipeline's
//     pixel output (plays in ffmpeg/mpv; no codec dependencies).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (produces libsvt_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

// Read `nbytes` from `path` at `offset` into `dst` using `n_threads`
// parallel pread calls. Returns 0 on success, -1 on open failure,
// -2 on short read.
int svt_pread_parallel(const char* path, uint64_t offset, uint64_t nbytes,
                       uint8_t* dst, int n_threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  if (n_threads < 1) n_threads = 1;
  const uint64_t chunk = (nbytes + n_threads - 1) / n_threads;
  std::vector<std::thread> threads;
  std::vector<int> status(n_threads, 0);
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&, t]() {
      uint64_t begin = t * chunk;
      if (begin >= nbytes) return;
      uint64_t end = begin + chunk < nbytes ? begin + chunk : nbytes;
      uint64_t pos = begin;
      while (pos < end) {
        ssize_t r = pread(fd, dst + pos, end - pos, (off_t)(offset + pos));
        if (r <= 0) {
          status[t] = -2;
          return;
        }
        pos += (uint64_t)r;
      }
    });
  }
  for (auto& th : threads) th.join();
  close(fd);
  for (int s : status)
    if (s != 0) return s;
  return 0;
}

// Write an RGB24 video (frames, height, width, 3) as Y4M with 4:2:0
// BT.601 chroma subsampling. fps as rational num/den. Returns 0 on success.
int svt_write_y4m(const char* path, const uint8_t* rgb, int frames, int height,
                  int width, int fps_num, int fps_den) {
  if (height % 2 || width % 2) return -3;  // 4:2:0 needs even dims
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fprintf(f, "YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n", width, height,
          fps_num, fps_den);
  const int hw = width / 2, hh = height / 2;
  std::vector<uint8_t> y((size_t)height * width);
  std::vector<uint8_t> u((size_t)hh * hw), v((size_t)hh * hw);
  for (int t = 0; t < frames; ++t) {
    const uint8_t* fr = rgb + (size_t)t * height * width * 3;
    for (int i = 0; i < height; ++i) {
      for (int j = 0; j < width; ++j) {
        const uint8_t* p = fr + ((size_t)i * width + j) * 3;
        float R = p[0], G = p[1], B = p[2];
        float Y = 0.299f * R + 0.587f * G + 0.114f * B;
        y[(size_t)i * width + j] = (uint8_t)(Y < 0 ? 0 : (Y > 255 ? 255 : Y));
      }
    }
    for (int i = 0; i < hh; ++i) {
      for (int j = 0; j < hw; ++j) {
        // average the 2x2 block for chroma
        float R = 0, G = 0, B = 0;
        for (int di = 0; di < 2; ++di)
          for (int dj = 0; dj < 2; ++dj) {
            const uint8_t* p =
                fr + (((size_t)(2 * i + di) * width) + (2 * j + dj)) * 3;
            R += p[0];
            G += p[1];
            B += p[2];
          }
        R *= 0.25f;
        G *= 0.25f;
        B *= 0.25f;
        float U = -0.168736f * R - 0.331264f * G + 0.5f * B + 128.0f;
        float V = 0.5f * R - 0.418688f * G - 0.081312f * B + 128.0f;
        u[(size_t)i * hw + j] = (uint8_t)(U < 0 ? 0 : (U > 255 ? 255 : U));
        v[(size_t)i * hw + j] = (uint8_t)(V < 0 ? 0 : (V > 255 ? 255 : V));
      }
    }
    fputs("FRAME\n", f);
    fwrite(y.data(), 1, y.size(), f);
    fwrite(u.data(), 1, u.size(), f);
    fwrite(v.data(), 1, v.size(), f);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
