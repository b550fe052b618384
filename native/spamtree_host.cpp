// Native host-side runtime for spamtree_tpu.
//
// TPU-native counterpart of the reference's C++ host kernels
// (reference: src/tree_dep.cpp — kthresholds, part_axis_parallel_lmt,
// number_revalue) plus runtime services the JAX compute path needs around it:
// an asynchronous sample sink that streams kept MCMC draws to disk on a
// writer thread so device->host transfer never blocks the sampler.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: see native/Makefile.  Python falls back to NumPy implementations if
// the shared library is absent.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---- quantile thresholds: sorted(x)[i*n/k], i=1..k-1 (nth_element, O(n*k)) --
void st_kthresholds(const double* x, int64_t n, int64_t k, double* out) {
  if (n <= 0) {  // empty pool: no order statistics exist
    for (int64_t i = 1; i < k; i++) out[i - 1] = 0.0;
    return;
  }
  std::vector<double> buf(x, x + n);
  if (k - 1 >= 16) {
    // many cut points: one O(n log n) sort beats k O(n) selections (the
    // deep tree levels ask for hundreds of thresholds over n ~ 1e6 rows;
    // the naive nth_element loop measured 11.5 s of a 17.5 s tree build)
    std::sort(buf.begin(), buf.end());
    for (int64_t i = 1; i < k; i++) out[i - 1] = buf[i * n / k];
    return;
  }
  // few cut points: ascending positions let each nth_element work on the
  // suffix the previous call already partitioned
  int64_t lo = 0;
  for (int64_t i = 1; i < k; i++) {
    int64_t q = i * n / k;
    std::nth_element(buf.begin() + lo, buf.begin() + q, buf.end());
    out[i - 1] = buf[q];
    lo = q;
  }
}

// ---- per-axis interval index: 1 + #{t : v >= t} over sorted thresholds -----
void st_column_threshold(const double* col, int64_t n, const double* thr,
                         int64_t nthr, int64_t* out) {
#ifdef _OPENMP
#pragma omp parallel for
#endif
  for (int64_t i = 0; i < n; i++) {
    // thresholds are sorted: binary search for count of thr <= col[i]
    const double* hi = std::upper_bound(thr, thr + nthr, col[i]);
    out[i] = 1 + (hi - thr);
  }
}

// ---- group rows by integer cell keys ---------------------------------------
// Returns, via out arrays: a stable permutation `order` sorting rows by key,
// and `n_groups` boundaries in `starts` (starts[g]..starts[g+1] index into
// order).  Replaces the R group_by/split dance (reference: make_tree.R,
// spamtree_fit.R:324 indexing split).
int64_t st_group_by_key(const int64_t* keys, int64_t n, int64_t* order,
                        int64_t* starts) {
  for (int64_t i = 0; i < n; i++) order[i] = i;
  std::stable_sort(order, order + n, [&](int64_t a, int64_t b) {
    return keys[a] < keys[b];
  });
  int64_t g = 0;
  for (int64_t i = 0; i < n; i++) {
    if (i == 0 || keys[order[i]] != keys[order[i - 1]]) {
      starts[g++] = i;
    }
  }
  starts[g] = n;
  return g;
}

// NOTE: the reference's number_revalue (tree_dep.cpp:240-259) has no
// equivalent here by design: block ids are constructed contiguously by the
// partitioner and remapped with O(1) NumPy lookup tables in the schedule
// builder, so a per-element binary-search remap kernel would be slower.

// ---- asynchronous sample sink ----------------------------------------------
// Double-buffered writer thread appending fixed-size records to a file.
// The sampler thread calls st_sink_push (memcpy + enqueue, never blocks on
// IO); the writer thread drains to disk.

struct Sink {
  FILE* f;
  std::thread writer;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<std::vector<char>> queue;
  std::atomic<bool> closing{false};
  std::atomic<int64_t> records{0};
  size_t max_queue;
};

void* st_sink_open(const char* path, int64_t max_queue, int64_t append) {
  FILE* f = std::fopen(path, append ? "ab" : "wb");
  if (!f) return nullptr;
  Sink* s = new Sink();
  s->f = f;
  s->max_queue = (size_t)(max_queue > 0 ? max_queue : 16);
  s->writer = std::thread([s]() {
    for (;;) {
      std::vector<char> item;
      {
        std::unique_lock<std::mutex> lk(s->mu);
        s->cv.wait(lk, [s] { return !s->queue.empty() || s->closing.load(); });
        if (s->queue.empty()) {
          if (s->closing.load()) return;
          continue;
        }
        item = std::move(s->queue.front());
        s->queue.pop_front();
      }
      s->cv.notify_all();
      std::fwrite(item.data(), 1, item.size(), s->f);
    }
  });
  return s;
}

void st_sink_push(void* handle, const char* data, int64_t nbytes) {
  Sink* s = static_cast<Sink*>(handle);
  std::vector<char> item(data, data + nbytes);
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv.wait(lk, [s] { return s->queue.size() < s->max_queue; });
    s->queue.emplace_back(std::move(item));
    s->records.fetch_add(1);
  }
  s->cv.notify_all();
}

int64_t st_sink_close(void* handle) {
  Sink* s = static_cast<Sink*>(handle);
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->closing.store(true);
  }
  s->cv.notify_all();
  s->writer.join();
  std::fflush(s->f);
  std::fclose(s->f);
  int64_t rec = s->records.load();
  delete s;
  return rec;
}

}  // extern "C"
