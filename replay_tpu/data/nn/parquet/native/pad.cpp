// Native left-pad (keep-tail) for ragged parquet rows.
//
// The hot host-side loop of the streaming data plane
// (replay_tpu/data/nn/parquet/parquet_dataset.py::_pad_list_batch;
// reference: replay/data/nn/parquet/impl/array_1d_column.py) turns
// (flat values, per-row offsets) into a [B, L] left-padded batch.  The
// numpy formulation builds a [B, L] gather-index matrix + clip + fancy
// gather + masked fill — ~4 full passes and it HOLDS THE GIL, so loader
// worker threads cannot overlap it with device steps (PERF.md "host data
// plane": the 4-core box is GIL-contended).
//
// Here each row is ONE contiguous memcpy of its kept tail (left-pad
// keep-tail means the source segment is contiguous), a head fill, and a
// mask fill — and ctypes releases the GIL for the whole call, so worker
// threads genuinely overlap.  Optional std::thread row-parallelism for
// big batches.
//
// Build: g++ -O3 -shared -fPIC pad.cpp -o libreplay_pad.so  (see pad.py)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

template <typename T>
void pad_range(const T* flat, const int64_t* starts, const int64_t* lens,
               int64_t row_lo, int64_t row_hi, int64_t L, T padding,
               T* out, int8_t* mask) {
    for (int64_t r = row_lo; r < row_hi; ++r) {
        T* dst = out + r * L;
        int8_t* m = mask + r * L;
        const int64_t len = lens[r];
        const int64_t keep = std::min<int64_t>(len, L);
        const int64_t pad = L - keep;
        for (int64_t j = 0; j < pad; ++j) {
            dst[j] = padding;
        }
        std::memset(m, 0, static_cast<size_t>(pad));
        // keep-tail: the LAST `keep` values of the row, contiguous in flat
        const T* src = flat + starts[r] + len - keep;
        std::memcpy(dst + pad, src, static_cast<size_t>(keep) * sizeof(T));
        std::memset(m + pad, 1, static_cast<size_t>(keep));
    }
}

template <typename T>
void pad_rows(const T* flat, const int64_t* starts, const int64_t* lens,
              int64_t n_rows, int64_t L, T padding, T* out, int8_t* mask,
              int n_threads) {
    if (n_threads <= 1 || n_rows < 4096) {
        pad_range(flat, starts, lens, 0, n_rows, L, padding, out, mask);
        return;
    }
    std::vector<std::thread> workers;
    const int64_t chunk = (n_rows + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        const int64_t lo = t * chunk;
        const int64_t hi = std::min<int64_t>(lo + chunk, n_rows);
        if (lo >= hi) break;
        workers.emplace_back(pad_range<T>, flat, starts, lens, lo, hi, L,
                             padding, out, mask);
    }
    for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

void pad_rows_i32(const int32_t* flat, const int64_t* starts,
                  const int64_t* lens, int64_t n_rows, int64_t L,
                  int32_t padding, int32_t* out, int8_t* mask,
                  int n_threads) {
    pad_rows(flat, starts, lens, n_rows, L, padding, out, mask, n_threads);
}

void pad_rows_i64(const int64_t* flat, const int64_t* starts,
                  const int64_t* lens, int64_t n_rows, int64_t L,
                  int64_t padding, int64_t* out, int8_t* mask,
                  int n_threads) {
    pad_rows(flat, starts, lens, n_rows, L, padding, out, mask, n_threads);
}

void pad_rows_f32(const float* flat, const int64_t* starts,
                  const int64_t* lens, int64_t n_rows, int64_t L,
                  float padding, float* out, int8_t* mask, int n_threads) {
    pad_rows(flat, starts, lens, n_rows, L, padding, out, mask, n_threads);
}

void pad_rows_f64(const double* flat, const int64_t* starts,
                  const int64_t* lens, int64_t n_rows, int64_t L,
                  double padding, double* out, int8_t* mask, int n_threads) {
    pad_rows(flat, starts, lens, n_rows, L, padding, out, mask, n_threads);
}

}  // extern "C"
