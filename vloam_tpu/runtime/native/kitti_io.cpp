// Native data-loading runtime for the TPU pipeline.
//
// Replaces the reference's C++ host IO (point_cloud_util.cpp
// loadPointCloud :118-146 and the rosbag feed): a direct velodyne .bin
// reader plus a multi-threaded prefetching sequence loader that keeps the
// next frames parsed and padded while the device computes the current one.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// Read one KITTI velodyne .bin (x,y,z,reflectance float32 records) into
// out_xyz[max_pts*3]; returns the number of points written, or -1 on error.
int load_bin(const char* path, float* out_xyz, int max_pts) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<float> buf(1 << 16);
  int n = 0;
  size_t got;
  size_t carry = 0;
  while ((got = std::fread(buf.data() + carry, sizeof(float),
                           buf.size() - carry, f)) > 0 ||
         carry >= 4) {
    size_t avail = carry + got;
    size_t recs = avail / 4;
    for (size_t r = 0; r < recs && n < max_pts; ++r) {
      out_xyz[3 * n + 0] = buf[4 * r + 0];
      out_xyz[3 * n + 1] = buf[4 * r + 1];
      out_xyz[3 * n + 2] = buf[4 * r + 2];
      ++n;
    }
    carry = avail - recs * 4;
    if (carry) std::memmove(buf.data(), buf.data() + recs * 4,
                            carry * sizeof(float));
    if (got == 0) break;
    if (n >= max_pts) {
      // drain remaining file size for a correct total? capacity reached:
      break;
    }
  }
  std::fclose(f);
  return n;
}

struct Frame {
  int index;
  int count;
  std::vector<float> xyz;  // padded to max_pts*3
};

struct Loader {
  std::vector<std::string> paths;
  int max_pts;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::queue<Frame> ready;          // frames parsed, FIFO by submission order
  std::atomic<int> next_submit{0};  // next index to read
  int next_emit = 0;                // next index to hand to python
  std::vector<Frame> out_of_order;  // parsed but waiting for order
  size_t max_queue;
  bool stop = false;

  Loader(std::vector<std::string> p, int mp, int n_threads)
      : paths(std::move(p)), max_pts(mp), max_queue(4 + n_threads) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { work(); });
  }

  void work() {
    for (;;) {
      int idx = next_submit.fetch_add(1);
      if (idx >= static_cast<int>(paths.size())) return;
      Frame fr;
      fr.index = idx;
      fr.xyz.assign(static_cast<size_t>(max_pts) * 3, 0.0f);
      fr.count = load_bin(paths[idx].c_str(), fr.xyz.data(), max_pts);
      std::unique_lock<std::mutex> lk(mu);
      cv_ready.wait(lk, [this] {
        return stop || ready.size() + out_of_order.size() < max_queue * 2;
      });
      if (stop) return;
      out_of_order.push_back(std::move(fr));
      // move any in-order frames to the ready queue
      bool moved = true;
      while (moved) {
        moved = false;
        for (size_t i = 0; i < out_of_order.size(); ++i) {
          if (out_of_order[i].index ==
              next_emit + static_cast<int>(ready.size())) {
            ready.push(std::move(out_of_order[i]));
            out_of_order.erase(out_of_order.begin() + i);
            moved = true;
            break;
          }
        }
      }
      cv_ready.notify_all();
    }
  }

  // Returns count (>=0) and fills out; -2 when the sequence is exhausted.
  int next(float* out) {
    std::unique_lock<std::mutex> lk(mu);
    if (next_emit >= static_cast<int>(paths.size())) return -2;
    cv_ready.wait(lk, [this] { return stop || !ready.empty(); });
    if (stop) return -3;
    Frame fr = std::move(ready.front());
    ready.pop();
    ++next_emit;
    cv_ready.notify_all();
    lk.unlock();
    std::memcpy(out, fr.xyz.data(),
                static_cast<size_t>(max_pts) * 3 * sizeof(float));
    return fr.count;
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_ready.notify_all();
    for (auto& w : workers) w.join();
  }
};

}  // namespace

extern "C" {

int vloam_load_bin(const char* path, float* out_xyz, int max_pts) {
  return load_bin(path, out_xyz, max_pts);
}

void* vloam_loader_create(const char** paths, int n_paths, int max_pts,
                          int n_threads) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new Loader(std::move(p), max_pts, n_threads);
}

int vloam_loader_next(void* handle, float* out_xyz) {
  return static_cast<Loader*>(handle)->next(out_xyz);
}

void vloam_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
