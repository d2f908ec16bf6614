// Native runtime support library: image decode + threaded sequence
// prefetcher + protocol codec.
//
// Role: the host-side data path around the JAX/TPU compute core — the
// equivalent layer the reference implements in C++ around its solver
// (file readers run_io_reprojection_test.cpp:54-97, image loading via
// OpenCV, run_track_nposes.cpp:160-181).  The compute itself is
// jax/XLA/Pallas; this library keeps the CPU-side frame feed off the
// Python interpreter: PGM/PPM decode, ITU-601 grayscale conversion, and
// an N-thread lookahead prefetcher so sequence reads overlap device
// steps.
//
// C ABI only (consumed via ctypes from invcompcamtrack_tpu.utils.native).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<float> data;  // grayscale float32
  bool ok = false;
};

bool read_token(FILE* f, std::string* tok) {
  tok->clear();
  int c;
  // skip whitespace + comments
  while ((c = fgetc(f)) != EOF) {
    if (c == '#') {
      while ((c = fgetc(f)) != EOF && c != '\n') {
      }
    } else if (!isspace(c)) {
      break;
    }
  }
  if (c == EOF) return false;
  do {
    tok->push_back(static_cast<char>(c));
  } while ((c = fgetc(f)) != EOF && !isspace(c));
  return true;
}

Image decode_pnm(const char* path) {
  Image img;
  FILE* f = fopen(path, "rb");
  if (!f) return img;
  std::string magic, ws, hs, maxs;
  if (!read_token(f, &magic) || !read_token(f, &ws) || !read_token(f, &hs) ||
      !read_token(f, &maxs)) {
    fclose(f);
    return img;
  }
  img.w = atoi(ws.c_str());
  img.h = atoi(hs.c_str());
  const long maxv = atol(maxs.c_str());
  // Validate header before allocating: a malformed/hostile header must
  // surface as a decode error through the C ABI, not a bad_alloc abort.
  if (img.w <= 0 || img.h <= 0 || maxv <= 0 || maxv > 65535 ||
      static_cast<long long>(img.w) * img.h > (1LL << 28)) {
    fclose(f);
    img.w = img.h = 0;
    return img;
  }
  const size_t n = static_cast<size_t>(img.w) * img.h;
  img.data.resize(n);

  if (magic == "P5" && maxv < 256) {  // binary PGM 8-bit
    std::vector<uint8_t> buf(n);
    if (fread(buf.data(), 1, n, f) != n) {
      fclose(f);
      return img;
    }
    for (size_t i = 0; i < n; ++i) img.data[i] = static_cast<float>(buf[i]);
  } else if (magic == "P5") {  // binary PGM 16-bit big-endian
    std::vector<uint8_t> buf(n * 2);
    if (fread(buf.data(), 1, n * 2, f) != n * 2) {
      fclose(f);
      return img;
    }
    for (size_t i = 0; i < n; ++i)
      img.data[i] = static_cast<float>((buf[2 * i] << 8) | buf[2 * i + 1]);
  } else if (magic == "P6" && maxv < 256) {  // binary PPM -> ITU-601 luma
    std::vector<uint8_t> buf(n * 3);
    if (fread(buf.data(), 1, n * 3, f) != n * 3) {
      fclose(f);
      return img;
    }
    for (size_t i = 0; i < n; ++i) {
      img.data[i] = 0.299f * buf[3 * i] + 0.587f * buf[3 * i + 1] +
                    0.114f * buf[3 * i + 2];
    }
  } else if (magic == "P2") {  // ascii PGM
    std::string t;
    for (size_t i = 0; i < n; ++i) {
      if (!read_token(f, &t)) {
        fclose(f);
        return img;
      }
      img.data[i] = static_cast<float>(atof(t.c_str()));
    }
  } else {
    fclose(f);
    return img;
  }
  fclose(f);
  img.ok = true;
  return img;
}

struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<Image> slots;
  std::vector<std::atomic<int>> state;  // 0 pending, 1 loading, 2 done, 3 released
  std::vector<std::thread> workers;
  std::atomic<size_t> next{0};
  std::atomic<bool> stop{false};
  std::mutex mu;
  std::condition_variable cv;

  explicit Prefetcher(std::vector<std::string> p, int n_threads)
      : paths(std::move(p)), slots(paths.size()), state(paths.size()) {
    for (auto& s : state) s.store(0);
    for (int t = 0; t < n_threads; ++t) {
      workers.emplace_back([this] { this->run(); });
    }
  }

  void run() {
    while (!stop.load()) {
      size_t i = next.fetch_add(1);
      if (i >= paths.size()) return;
      int expected = 0;
      if (!state[i].compare_exchange_strong(expected, 1)) continue;
      slots[i] = decode_pnm(paths[i].c_str());
      state[i].store(2);
      std::lock_guard<std::mutex> lk(mu);
      cv.notify_all();
    }
  }

  ~Prefetcher() {
    stop.store(true);
    next.store(paths.size());
    for (auto& w : workers)
      if (w.joinable()) w.join();
  }
};

}  // namespace

extern "C" {

// ---- single-image decode ----
// Returns 0 on success; fills *w, *h.  Call icct_image_data to copy the
// pixels out (two-phase because the caller allocates).
static thread_local Image g_last;

int icct_decode_pnm(const char* path, int* w, int* h) {
  g_last = decode_pnm(path);
  if (!g_last.ok) return -1;
  *w = g_last.w;
  *h = g_last.h;
  return 0;
}

int icct_image_data(float* out) {
  if (!g_last.ok) return -1;
  std::memcpy(out, g_last.data.data(), g_last.data.size() * sizeof(float));
  return 0;
}

// ---- threaded sequence prefetcher ----
void* icct_prefetch_create(const char** paths, int n, int n_threads) {
  std::vector<std::string> p(paths, paths + n);
  return new Prefetcher(std::move(p), n_threads > 0 ? n_threads : 2);
}

// Blocks until frame idx is decoded; returns 0 and fills *w,*h.
// A previously released frame (state 3) is transparently re-decoded.
int icct_prefetch_query(void* handle, int idx, int* w, int* h) {
  auto* pf = static_cast<Prefetcher*>(handle);
  if (idx < 0 || static_cast<size_t>(idx) >= pf->paths.size()) return -1;
  // steal the work if no worker picked it yet (0->1), or re-decode a
  // released slot (3->1)
  int expected = 0;
  bool steal = pf->state[idx].compare_exchange_strong(expected, 1);
  if (!steal) {
    expected = 3;
    steal = pf->state[idx].compare_exchange_strong(expected, 1);
  }
  if (steal) {
    pf->slots[idx] = decode_pnm(pf->paths[idx].c_str());
    pf->state[idx].store(2);
    // wake any concurrent waiter on the same index
    std::lock_guard<std::mutex> lk(pf->mu);
    pf->cv.notify_all();
  } else {
    std::unique_lock<std::mutex> lk(pf->mu);
    pf->cv.wait(lk, [&] { return pf->state[idx].load() == 2; });
  }
  if (!pf->slots[idx].ok) return -2;
  *w = pf->slots[idx].w;
  *h = pf->slots[idx].h;
  return 0;
}

int icct_prefetch_fetch(void* handle, int idx, float* out, int release) {
  auto* pf = static_cast<Prefetcher*>(handle);
  // state 3 (released) must error rather than hand back a cleared
  // buffer: callers re-query to force a re-decode
  if (pf->state[idx].load() != 2 || !pf->slots[idx].ok) return -1;
  std::memcpy(out, pf->slots[idx].data.data(),
              pf->slots[idx].data.size() * sizeof(float));
  if (release) {
    pf->slots[idx].data.clear();
    pf->slots[idx].data.shrink_to_fit();
    pf->state[idx].store(3);
  }
  return 0;
}

void icct_prefetch_destroy(void* handle) {
  delete static_cast<Prefetcher*>(handle);
}

// ---- binary point+camera protocol codec ----
// Layout: run_io_reprojection_test.cpp:54-79 (see utils/io.py).
int icct_read_pointcam(const char* path, double* pose6, float* fc2, float* cc2,
                       uint32_t* wh2, uint64_t* n_out, double* pt3d_xyz,
                       float* pt2d_xy, uint64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  bool ok = fread(pose6, 8, 6, f) == 6 && fread(fc2, 4, 2, f) == 2 &&
            fread(cc2, 4, 2, f) == 2 && fread(wh2, 4, 2, f) == 2 &&
            fread(&n, 8, 1, f) == 1;
  if (!ok || n > capacity) {
    fclose(f);
    return -2;
  }
  ok = fread(pt3d_xyz, 8, n, f) == n && fread(pt3d_xyz + n, 8, n, f) == n &&
       fread(pt3d_xyz + 2 * n, 8, n, f) == n && fread(pt2d_xy, 4, n, f) == n &&
       fread(pt2d_xy + n, 4, n, f) == n;
  fclose(f);
  if (!ok) return -3;
  *n_out = n;
  return 0;
}

int icct_write_pointcam(const char* path, const double* pose6,
                        const float* fc2, const float* cc2,
                        const uint32_t* wh2, uint64_t n,
                        const double* pt3d_xyz, const float* pt2d_xy) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  bool ok = fwrite(pose6, 8, 6, f) == 6 && fwrite(fc2, 4, 2, f) == 2 &&
            fwrite(cc2, 4, 2, f) == 2 && fwrite(wh2, 4, 2, f) == 2 &&
            fwrite(&n, 8, 1, f) == 1 && fwrite(pt3d_xyz, 8, n, f) == n &&
            fwrite(pt3d_xyz + n, 8, n, f) == n &&
            fwrite(pt3d_xyz + 2 * n, 8, n, f) == n &&
            fwrite(pt2d_xy, 4, n, f) == n && fwrite(pt2d_xy + n, 4, n, f) == n;
  fclose(f);
  return ok ? 0 : -2;
}

}  // extern "C"
