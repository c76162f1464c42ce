// proxtv_tpu native host runtime: low-latency 1D TV-L1 proxes + workspace pool.
//
// Role in the TPU framework: the TPU path (fused Pallas kernels) owns batched
// work, but a single short signal pays ~tens of ms of device dispatch latency
// for microseconds of compute.  This host engine serves that latency-sensitive
// tail — and doubles as an independent f64 oracle for the test-suite.
//
// The solver is the weighted linearized taut-string scan: walk the tube
// [running_sum - lam, running_sum + lam], maintaining the current affine
// segment's min/max feasible slopes; when the tube is violated, emit a
// completed segment at the pinned slope and restart after it.  This is the
// same published algorithm as the reference scan, with the reference's
// variable vocabulary (mn/mx, mn_height/mx_height, mn_break/mx_break,
// last_break — src/TVL1Wopt.cpp:364 tautString_TV1_Weighted,
// src/TVL1opt.cpp:359 linearizedTautString_TV1) but restructured control
// flow: a single unified loop with one sgn-parameterized break path, merged
// last-point handling, weighted and scalar penalties unified, and an
// endpoint-tie out-of-bounds guard the reference lacks.  It is also the
// sequential form of the lock-step scan in proxtv_tpu/ops/tv1d_l1.py
// tv1_tautstring.
//
// Exported C API (see proxtv_tpu/runtime/native.py):
//   ptv_tv1_host(y, n, lam, x)                  scalar-weight TV-L1 prox
//   ptv_tv1w_host(y, n, lam[n-1], x)            per-edge-weight TV-L1 prox
//   ptv_tv1_batch_host(Y, B, n, lam, X, nthr)   OpenMP batch fallback
//   ptv_ws_new / ptv_ws_free                    reusable workspace pool

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Weighted taut-string scan.  lam may be nullptr with scalar lam_s instead.
void taut_string(const double* y, int n, const double* lam, double lam_s,
                 double* x) {
  if (n <= 0) return;
  if (n == 1) { x[0] = y[0]; return; }

  auto LAM = [&](int i) { return lam ? lam[i] : lam_s; };

  int i = 0;                 // current scan position
  int seg_start = 0;         // first index of the open segment
  double mn = y[0] - LAM(0); // min feasible segment value
  double mx = y[0] + LAM(0); // max feasible segment value
  double mn_h = 0.0, mx_h = 0.0;   // tube heights at position i for mn/mx
  int mn_break = 0, mx_break = 0;  // last touch points of the tube walls
  int last_break = -1;

  while (i < n) {
    const bool is_last = (i == n - 1);
    const double li = is_last ? 0.0 : LAM(i);
    const double yi = y[i];

    // Advance the candidate heights with the current slopes.
    const double mn_h1 = mn_h + mn - yi;
    const double mx_h1 = mx_h + mx - yi;

    const bool ceil_viol = is_last ? (mn_h1 > 1e-15) : (li < mn_h1);
    const bool floor_viol = !ceil_viol
        && (is_last ? (mx_h1 < -1e-15) : (-li > mx_h1));

    if (ceil_viol || floor_viol) {
      // Emit the completed segment at the pinned wall value.
      const int b_end = ceil_viol ? mn_break : mx_break;
      const double b_val = ceil_viol ? mn : mx;
      for (int k = seg_start; k <= b_end; ++k) x[k] = b_val;

      // Restart right after the break.  An emit that reached the endpoint
      // leaves nothing to solve: terminate.  (Reachable only via a
      // floating-point-noise re-break at the restarted last point — the
      // endpoint-tie checks are absolute 1e-15 thresholds, so at |y| or
      // lam ~ 1e6 the rounding of y[n-1] + sgn*lam[n-2] re-triggers a
      // break with b_end == n-1; without this guard the restart would read
      // y[n] and lam[n-1] out of bounds.)
      const int j = b_end + 1;
      if (j >= n) break;
      const double lj_prev = LAM(j - 1);
      const double sgn = ceil_viol ? 1.0 : -1.0;
      const bool new_is_last = (j == n - 1);
      const double lj = new_is_last ? 0.0 : LAM(j);
      mn = y[j] + sgn * lj_prev - lj;
      mx = y[j] + sgn * lj_prev + lj;
      if (is_last) { mn_h = -sgn * lj_prev; mx_h = -sgn * lj_prev; }
      else         { mn_h = -lj;            mx_h = lj; }
      mn_break = j; mx_break = j;
      last_break = b_end;
      seg_start = j;
      i = is_last ? j : j + 1;
      continue;
    }

    if (is_last) {
      // Close the final segment: tie the string to the endpoint.
      const double denom = double(i - last_break);
      if (mn_h1 <= 0.0) mn += (-mn_h1) / denom;
      for (int k = seg_start; k < n; ++k) x[k] = mn;
      break;
    }

    // No violation: tighten the slopes where the tube walls are touched.
    const double denom = double(i - last_break);
    if (mx_h1 >= li) { mx += (li - mx_h1) / denom; mx_h = li; mx_break = i; }
    else             { mx_h = mx_h1; }
    if (mn_h1 <= -li) { mn += (-li - mn_h1) / denom; mn_h = -li; mn_break = i; }
    else              { mn_h = mn_h1; }
    ++i;
  }
}

struct Workspace {
  std::vector<double> d;
  std::vector<int> i;
};

}  // namespace

extern "C" {

void ptv_tv1_host(const double* y, int n, double lam, double* x) {
  taut_string(y, n, nullptr, lam, x);
}

void ptv_tv1w_host(const double* y, int n, const double* lam, double* x) {
  taut_string(y, n, lam, 0.0, x);
}

void ptv_tv1_batch_host(const double* Y, int B, int n, double lam, double* X,
                        int n_threads) {
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(static)
#endif
  for (int b = 0; b < B; ++b) {
    taut_string(Y + (size_t)b * n, n, nullptr, lam, X + (size_t)b * n);
  }
}

void* ptv_ws_new(int capacity) {
  Workspace* ws = new Workspace();
  ws->d.reserve((size_t)capacity);
  ws->i.reserve((size_t)capacity);
  return ws;
}

void ptv_ws_free(void* ws) { delete static_cast<Workspace*>(ws); }

double* ptv_ws_double(void* ws, int size) {
  Workspace* w = static_cast<Workspace*>(ws);
  if ((int)w->d.size() < size) w->d.resize((size_t)size);
  return w->d.data();
}

}  // extern "C"
