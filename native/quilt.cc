// Async output writer ("quilt server").
//
// TPU-native equivalent of WRF's async I/O quilting
// (frame/module_io_quilt_old.F:514-1556): the reference dedicates MPI ranks
// that aggregate patch writes so compute ranks never block on disk.  Here a
// native thread pool plays that role for the single-process JAX runtime:
// the host loop hands off serialized snapshots (history / restart / particle
// state) and returns to dispatching device work immediately.
//
// C ABI (ctypes): quilt_start(n_threads), quilt_submit(path, data, nbytes),
// quilt_pending(), quilt_flush(), quilt_stop().

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Job {
  std::string path;
  std::vector<uint8_t> data;
};

std::mutex g_mu;
std::condition_variable g_cv;
std::condition_variable g_cv_done;
std::deque<Job> g_queue;
std::vector<std::thread> g_threads;
std::atomic<bool> g_stop{false};
std::atomic<long> g_in_flight{0};
std::atomic<long> g_errors{0};

void worker() {
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> lk(g_mu);
      g_cv.wait(lk, [] { return g_stop.load() || !g_queue.empty(); });
      if (g_queue.empty()) {
        if (g_stop.load()) return;
        continue;
      }
      job = std::move(g_queue.front());
      g_queue.pop_front();
    }
    std::FILE* f = std::fopen(job.path.c_str(), "wb");
    if (f == nullptr) {
      g_errors.fetch_add(1);
    } else {
      size_t n = std::fwrite(job.data.data(), 1, job.data.size(), f);
      if (n != job.data.size()) g_errors.fetch_add(1);
      std::fclose(f);
    }
    g_in_flight.fetch_sub(1);
    g_cv_done.notify_all();
  }
}

}  // namespace

extern "C" {

int quilt_start(int n_threads) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (!g_threads.empty()) return 0;  // already running
  g_stop.store(false);
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; ++i) g_threads.emplace_back(worker);
  return n_threads;
}

int quilt_submit(const char* path, const void* data, int64_t nbytes) {
  if (path == nullptr || (data == nullptr && nbytes > 0) || nbytes < 0) {
    return -1;
  }
  Job job;
  job.path = path;
  job.data.resize(static_cast<size_t>(nbytes));
  if (nbytes > 0) std::memcpy(job.data.data(), data, static_cast<size_t>(nbytes));
  {
    std::lock_guard<std::mutex> lk(g_mu);
    if (g_threads.empty()) return -2;  // not started
    g_in_flight.fetch_add(1);
    g_queue.push_back(std::move(job));
  }
  g_cv.notify_one();
  return 0;
}

int64_t quilt_pending(void) { return g_in_flight.load(); }

int quilt_flush(void) {
  std::unique_lock<std::mutex> lk(g_mu);
  g_cv_done.wait(lk, [] { return g_in_flight.load() == 0; });
  return static_cast<int>(g_errors.exchange(0));
}

void quilt_stop(void) {
  {
    std::lock_guard<std::mutex> lk(g_mu);
    g_stop.store(true);
  }
  g_cv.notify_all();
  for (auto& t : g_threads) t.join();
  g_threads.clear();
}

}  // extern "C"
