// Native slot-stream expansion for linkpred_tpu's tile planner.
//
// The packed-path plan (linkpred_tpu/predict/plan.py, mirroring the expansion
// the reference performs inside its hot loop, /root/reference/inc/
// predict.hxx:154-179,306-307) materializes one record per second-hop
// candidate slot: for every surviving first-hop edge (u -> mid), every
// neighbor w of mid past the plan-time `w > u` prefilter that is NOT u itself
// and NOT already adjacent to u.  NumPy expresses this as np.repeat + a
// global-edge-key searchsorted over ~10^8-entry int64 temporaries (~20-40 s
// and several GB of temps at RMAT-19); this translation unit does it in one
// fused pass over the int32 CSR — the candidate loop is a linear indices walk
// and the dead-slot test is a branchless binary search in N(u).
//
// C ABI only — loaded with ctypes, no pybind11 dependency.  Python remains
// the source of truth for plan SEMANTICS: tests assert the native fill equals
// the NumPy fill element-for-element, and LINKPRED_NATIVE_PLAN=0 disables it.

#include <cstdint>

namespace {

// first index in [lo, hi) with a[i] >= key (a ascending)
inline int64_t lower_bound_i32(const int32_t *a, int64_t lo, int64_t hi,
                               int32_t key) {
  while (lo < hi) {
    int64_t m = lo + ((hi - lo) >> 1);
    if (a[m] < key)
      lo = m + 1;
    else
      hi = m;
  }
  return lo;
}

inline bool adjacent(const int32_t *indices, int64_t lo, int64_t hi,
                     int32_t w) {
  int64_t p = lower_bound_i32(indices, lo, hi, w);
  return p < hi && indices[p] == w;
}

} // namespace

extern "C" {

// Expand the filtered first-hop edge list (src, mid, skip)[m1] into packed
// slot arrays, dropping dead candidates (w == u or w in N(u)).  Edge rows
// arrive lexsorted by (src, mid) and cover REAL edges only (no killers), so
// the fill order matches the NumPy path's kept-slot order exactly.
//
//   upper_only != 0: `skip` already positions the walk at the first w > u.
//   deg16 != 0:      slot_udeg receives (deg(u) << 16) | deg(w); slot_wdeg
//                    may be null.  Otherwise slot_udeg = deg(u), slot_wdeg =
//                    deg(w).
//   cnt_u (len n):   kept slots per source (the partition/huge input).
//
// Returns the kept slot count (never exceeds `est`, the caller-computed
// pre-removal bound sum(deg(mid) - skip)); -1 on overflow of `est`.
int64_t lp_plan_expand(const int32_t *offsets, const int32_t *indices,
                       int64_t n, const int32_t *src, const int32_t *mid,
                       const int32_t *skip, int64_t m1, int32_t upper_only,
                       int32_t deg16, int64_t est, int32_t *slot_w,
                       int32_t *slot_u, int32_t *slot_udeg, int32_t *slot_wdeg,
                       int32_t *slot_middeg, int64_t *cnt_u) {
  (void)upper_only; // the `skip` column already encodes the w > u prefilter;
                    // the w == u and adjacency drops below apply to both modes
  for (int64_t i = 0; i < n; ++i)
    cnt_u[i] = 0;
  int64_t kept = 0;
  for (int64_t e = 0; e < m1; ++e) {
    const int32_t u = src[e];
    const int32_t m = mid[e];
    const int64_t ulo = offsets[u], uhi = offsets[u + 1];
    const int64_t mlo = (int64_t)offsets[m] + skip[e], mhi = offsets[m + 1];
    const int32_t du = (int32_t)(uhi - ulo);
    const int32_t dm = (int32_t)(mhi - (int64_t)offsets[m]);
    const int32_t mdeg = dm; // deg(mid), before the skip
    for (int64_t p = mlo; p < mhi; ++p) {
      const int32_t w = indices[p];
      if (w == u || adjacent(indices, ulo, uhi, w))
        continue;
      if (kept >= est)
        return -1;
      slot_w[kept] = w;
      slot_u[kept] = u;
      const int32_t dw = offsets[w + 1] - offsets[w];
      if (deg16) {
        slot_udeg[kept] =
            (int32_t)(((uint32_t)du << 16) | (uint32_t)(uint16_t)dw);
      } else {
        slot_udeg[kept] = du;
        slot_wdeg[kept] = dw;
      }
      slot_middeg[kept] = mdeg;
      ++kept;
      ++cnt_u[u];
    }
  }
  return kept;
}

// Filtered first-hop edge list: the plan's stage 1 (plan.py build_plan).
// For every directed edge (u -> mid) whose intermediate passes the LHub mask
// (deg(mid) <= min_degree1 when the threshold is set, predict.hxx:227,301)
// and still has work after the w > u prefilter, emit (u, mid, skip) where
// `skip` = |{w in N(mid): w <= u}| (adjacency rows are sorted, so the
// surviving neighbors are a contiguous tail — one binary search per edge
// replaces NumPy's global-edge-key searchsorted over an O(m) int64 temp).
// Killer pseudo-edges (one per source with >= 1 surviving row, used by the
// edge-stream path and the per-source slot accounting) land in kuniq/kskip;
// *ku_out receives their count.  Emission order matches the NumPy path
// exactly: ascending u, row order within u.
//
// Returns the surviving row count m1 (caller sizes src/mid/skip at m and
// kuniq/kskip at n).
int64_t lp_plan_firsthop(const int32_t *offsets, const int32_t *indices,
                         int64_t n, int32_t min_degree1, int32_t upper_only,
                         int32_t *src, int32_t *mid, int32_t *skip,
                         int32_t *kuniq, int32_t *kskip, int64_t *ku_out) {
  int64_t m1 = 0, ku = 0;
  for (int64_t u = 0; u < n; ++u) {
    const int64_t ulo = offsets[u], uhi = offsets[u + 1];
    bool active = false;
    for (int64_t p = ulo; p < uhi; ++p) {
      const int32_t m = indices[p];
      const int64_t mlo = offsets[m], mhi = offsets[m + 1];
      const int32_t dm = (int32_t)(mhi - mlo);
      if (dm <= 0 || (min_degree1 && dm > min_degree1))
        continue;
      int32_t s = 0;
      if (upper_only) {
        s = (int32_t)(lower_bound_i32(indices, mlo, mhi, (int32_t)(u + 1)) -
                      mlo);
        if (dm - s <= 0)
          continue;
      }
      src[m1] = (int32_t)u;
      mid[m1] = m;
      skip[m1] = s;
      ++m1;
      active = true;
    }
    if (active) {
      int32_t s = 0;
      if (upper_only) {
        s = (int32_t)(lower_bound_i32(indices, ulo, uhi, (int32_t)(u + 1)) -
                      ulo);
        if ((int32_t)(uhi - ulo) - s <= 0)
          continue; // killer has no surviving slots: dropped (NumPy knz)
      }
      kuniq[ku] = (int32_t)u;
      kskip[ku] = s;
      ++ku;
    }
  }
  *ku_out = ku;
  return m1;
}

} // extern "C"
