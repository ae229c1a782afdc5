// Native host runtime for phastft_tpu.
//
// The device compute path is XLA/Pallas; this library is the host-side
// runtime around it — the role the Rust core's non-kernel code plays in
// the reference (/root/reference/src/planner.rs table construction,
// /root/reference/src/complex_nums.rs interleave converters,
// /root/reference/pyphastft PyO3 glue). Plan construction cost is a
// benchmarked quantity in the reference (benches/planner.rs), so table
// generation is multithreaded C++ rather than single-threaded numpy.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Every function writes into caller-allocated numpy buffers.

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

// Run fn(lo, hi) over [0, total) on up to `threads` hardware threads.
template <typename F>
void parallel_for(int64_t total, F fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t min_chunk = 1 << 16;
  int64_t nthreads = hw ? static_cast<int64_t>(hw) : 1;
  if (total < min_chunk * 2 || nthreads <= 1) {
    fn(static_cast<int64_t>(0), total);
    return;
  }
  if (nthreads > (total + min_chunk - 1) / min_chunk)
    nthreads = (total + min_chunk - 1) / min_chunk;
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  int64_t chunk = (total + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < total ? lo + chunk : total;
    if (lo >= hi) break;
    pool.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

constexpr double kTau = 6.283185307179586476925286766559;

}  // namespace

extern "C" {

// out[i] = bit-reversal of i in log_n bits. Doubling recurrence per block
// so each thread can compute its range independently from scratch.
void bit_reverse_indices32(int32_t log_n, int32_t* out) {
  const int64_t n = int64_t{1} << log_n;
  parallel_for(n, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t v = static_cast<uint64_t>(i);
      v = ((v >> 1) & 0x5555555555555555ULL) | ((v & 0x5555555555555555ULL) << 1);
      v = ((v >> 2) & 0x3333333333333333ULL) | ((v & 0x3333333333333333ULL) << 2);
      v = ((v >> 4) & 0x0F0F0F0F0F0F0F0FULL) | ((v & 0x0F0F0F0F0F0F0F0FULL) << 4);
      v = ((v >> 8) & 0x00FF00FF00FF00FFULL) | ((v & 0x00FF00FF00FF00FFULL) << 8);
      v = ((v >> 16) & 0x0000FFFF0000FFFFULL) | ((v & 0x0000FFFF0000FFFFULL) << 16);
      v = (v >> 32) | (v << 32);
      out[i] = static_cast<int32_t>(v >> (64 - log_n));
    }
  });
}

// W_m^k = exp(-2*pi*i*k/m) for k < count, scaled by `scale` (the R2C
// planner folds 0.5 into its untangle table, reference src/planner.rs:125).
void twiddles_f64(int64_t m, int64_t count, double scale, double* cre,
                  double* cim) {
  const double step = -kTau / static_cast<double>(m);
  parallel_for(count, [=](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      double ang = step * static_cast<double>(k);
      cre[k] = scale * std::cos(ang);
      cim[k] = scale * std::sin(ang);
    }
  });
}

void twiddles_f32(int64_t m, int64_t count, double scale, float* cre,
                  float* cim) {
  // computed in f64, rounded once (reference src/planner.rs:148-159)
  const double step = -kTau / static_cast<double>(m);
  parallel_for(count, [=](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      double ang = step * static_cast<double>(k);
      cre[k] = static_cast<float>(scale * std::cos(ang));
      cim[k] = static_cast<float>(scale * std::sin(ang));
    }
  });
}

// Four-step / leaf correction table W_n^(r*c), n = rows*cols, row-major.
void correction_table_f64(int64_t rows, int64_t cols, double* cre,
                          double* cim) {
  const double inv_n = 1.0 / static_cast<double>(rows * cols);
  parallel_for(rows, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      for (int64_t c = 0; c < cols; ++c) {
        double ang = -kTau * (static_cast<double>(r) *
                              static_cast<double>(c) * inv_n);
        cre[r * cols + c] = std::cos(ang);
        cim[r * cols + c] = std::sin(ang);
      }
    }
  });
}

void correction_table_f32(int64_t rows, int64_t cols, float* cre,
                          float* cim) {
  const double inv_n = 1.0 / static_cast<double>(rows * cols);
  parallel_for(rows, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      for (int64_t c = 0; c < cols; ++c) {
        double ang = -kTau * (static_cast<double>(r) *
                              static_cast<double>(c) * inv_n);
        cre[r * cols + c] = static_cast<float>(std::cos(ang));
        cim[r * cols + c] = static_cast<float>(std::sin(ang));
      }
    }
  });
}

// Interleaved (re,im) pairs <-> planar converters
// (reference src/complex_nums.rs:12-55).
void deinterleave_f64(const double* x, int64_t pairs, double* re,
                      double* im) {
  parallel_for(pairs, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      re[i] = x[2 * i];
      im[i] = x[2 * i + 1];
    }
  });
}

void interleave_f64(const double* re, const double* im, int64_t pairs,
                    double* x) {
  parallel_for(pairs, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      x[2 * i] = re[i];
      x[2 * i + 1] = im[i];
    }
  });
}

void deinterleave_f32(const float* x, int64_t pairs, float* re, float* im) {
  parallel_for(pairs, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      re[i] = x[2 * i];
      im[i] = x[2 * i + 1];
    }
  });
}

void interleave_f32(const float* re, const float* im, int64_t pairs,
                    float* x) {
  parallel_for(pairs, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      x[2 * i] = re[i];
      x[2 * i + 1] = im[i];
    }
  });
}

}  // extern "C"
