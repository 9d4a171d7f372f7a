// Native CMC/mAP ranking — C++ counterpart of the reference's Cython
// extension (torchreid/metrics/rank_cylib/rank_cy.pyx). Role parity: the
// per-query ranking walks are the host-side hot loop of evaluation; this
// implementation keeps them cache-friendly C++ with OpenMP over queries.
// (On-device evaluation lives in agrl_tpu/ops/rank.py; this extension is
// the host fast path for CPU-only runs and for protocols that need the
// full ranking.)
//
// Exposed C ABI (ctypes; see agrl_tpu/metrics/rank_native.py):
//   evaluate_mars_c       — MARS protocol (rank.py:160-212 semantics)
//   evaluate_market1501_c — market1501 protocol (rank.py:95-150 semantics)
// Both take the (Q, G) float32 distance matrix, int64 pid/camid arrays,
// and write per-query CMC rows and APs; averaging happens in Python.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

// indices of the ranking (ascending distance) for one query row
inline void argsort_row(const float* row, int64_t g, std::vector<int32_t>& idx) {
  idx.resize(g);
  std::iota(idx.begin(), idx.end(), 0);
  std::sort(idx.begin(), idx.end(), [row](int32_t a, int32_t b) {
    return row[a] < row[b] || (row[a] == row[b] && a < b);
  });
}

// partial top-k ranking (enough for truncated protocols). Ties break by
// lower gallery index in BOTH branches — the same deterministic order as
// lax.top_k on device — so tied distances rank identically regardless of
// gallery size or backend.
inline void argtopk_row(const float* row, int64_t g, int64_t k,
                        std::vector<int32_t>& idx) {
  idx.resize(g);
  std::iota(idx.begin(), idx.end(), 0);
  const auto lt = [row](int32_t a, int32_t b) {
    return row[a] < row[b] || (row[a] == row[b] && a < b);
  };
  if (k < g) {
    std::partial_sort(idx.begin(), idx.begin() + k, idx.end(), lt);
    idx.resize(k);
  } else {
    std::sort(idx.begin(), idx.end(), lt);
  }
}

}  // namespace

extern "C" {

// MARS protocol: good = same pid & different cam; junk = pid == -1 or
// same pid & same cam; ranking truncated to max_rank BEFORE scoring;
// trapezoid AP with the full-gallery good count as recall denominator.
void evaluate_mars_c(const float* distmat, const int64_t* q_pids,
                     const int64_t* g_pids, const int64_t* q_camids,
                     const int64_t* g_camids, int64_t num_q, int64_t num_g,
                     int64_t max_rank, float* out_cmc /* (Q, max_rank) */,
                     float* out_ap /* (Q,) */) {
  const int64_t rank_len = std::min(max_rank, num_g);
#pragma omp parallel
  {
    std::vector<int32_t> order;
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < num_q; ++q) {
      const float* row = distmat + q * num_g;
      const int64_t qp = q_pids[q];
      const int64_t qc = q_camids[q];

      int64_t ngood = 0;
      for (int64_t g = 0; g < num_g; ++g)
        if (g_pids[g] == qp && g_camids[g] != qc) ++ngood;

      argtopk_row(row, num_g, rank_len, order);

      float* cmc = out_cmc + q * max_rank;
      std::memset(cmc, 0, sizeof(float) * max_rank);

      double ap = 0.0, old_recall = 0.0, old_precision = 1.0;
      int64_t intersect = 0, j = 0, njunk = 0;
      bool found_first_good = false;
      for (int64_t n = 0; n < rank_len; ++n) {
        const int64_t g = order[n];
        // junk BEFORE good: a row can satisfy both (e.g. a pid == -1
        // query against a -1 gallery entry on another camera) and the
        // oracle's `good &= keep` (metrics/rank.py) masks it out
        const bool junk = (g_pids[g] == -1) || (g_pids[g] == qp && g_camids[g] == qc);
        if (junk) {
          ++njunk;
          continue;
        }
        const bool good = (g_pids[g] == qp && g_camids[g] != qc);
        if (good && !found_first_good) {
          for (int64_t r = n - njunk; r < max_rank; ++r) cmc[r] = 1.0f;
          found_first_good = true;
        }
        if (good) ++intersect;
        if (ngood > 0) {
          const double recall = double(intersect) / double(ngood);
          const double precision = double(intersect) / double(j + 1);
          ap += (recall - old_recall) * (old_precision + precision) / 2.0;
          old_recall = recall;
          old_precision = precision;
        }
        ++j;
        if (intersect == ngood) break;  // reference early exit
      }
      out_ap[q] = float(ap);
    }
  }
}

// market1501 protocol: drop same-pid+same-cam entries; CMC = clipped
// cumsum; AP = mean precision at match positions over the FULL kept
// ranking. out_valid[q] = 0 marks queries with no kept match (excluded
// from averages by the caller).
void evaluate_market1501_c(const float* distmat, const int64_t* q_pids,
                           const int64_t* g_pids, const int64_t* q_camids,
                           const int64_t* g_camids, int64_t num_q,
                           int64_t num_g, int64_t max_rank,
                           float* out_cmc /* (Q, max_rank) */,
                           float* out_ap /* (Q,) */,
                           uint8_t* out_valid /* (Q,) */) {
#pragma omp parallel
  {
    std::vector<int32_t> order;
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < num_q; ++q) {
      const float* row = distmat + q * num_g;
      const int64_t qp = q_pids[q];
      const int64_t qc = q_camids[q];
      argsort_row(row, num_g, order);

      float* cmc = out_cmc + q * max_rank;
      std::memset(cmc, 0, sizeof(float) * max_rank);

      int64_t kept = 0, matches = 0;
      double prec_sum = 0.0;
      int64_t first_match_rank = -1;
      for (int64_t n = 0; n < num_g; ++n) {
        const int64_t g = order[n];
        const bool match = g_pids[g] == qp;
        if (match && g_camids[g] == qc) continue;  // removed entry
        const bool good = match;
        ++kept;
        if (good) {
          ++matches;
          prec_sum += double(matches) / double(kept);
          if (first_match_rank < 0) first_match_rank = kept - 1;
        }
      }
      if (matches == 0) {
        out_valid[q] = 0;
        out_ap[q] = 0.0f;
        continue;
      }
      out_valid[q] = 1;
      out_ap[q] = float(prec_sum / double(matches));
      for (int64_t r = std::min(first_match_rank, max_rank); r < max_rank; ++r)
        cmc[r] = 1.0f;
    }
  }
}

// cuhk03 protocol, pass 1 (deterministic): per query, sort the gallery,
// drop same-pid+same-cam entries, compute the standard AP over the full
// kept ranking, and emit the pid-GROUP structure of the kept list in
// first-appearance order (the order `defaultdict(list)` iteration yields
// in the reference, rank.py:59-61). The caller performs the protocol's
// 10x single-gallery-shot draws itself — one np.random draw per (query,
// repeat, group), replaying the reference's exact RNG stream — and only
// needs, per draw, the group's kept-slot list: group g of query q spans
// group_slots[q, group_off[g] : group_off[g] + group_sizes[q, g]].
//
// out_own_group[q] = index of the query-pid group (the only group whose
// slots are matches), -1 for invalid queries. CMC assembly from the draws
// is O(ngroups) per repeat in the caller: the masked CMC is a step
// function starting at the own chosen slot's rank among all chosen slots.
void cuhk03_prepare_c(const float* distmat, const int64_t* q_pids,
                      const int64_t* g_pids, const int64_t* q_camids,
                      const int64_t* g_camids, int64_t num_q, int64_t num_g,
                      float* out_ap /* (Q,) */, uint8_t* out_valid /* (Q,) */,
                      int32_t* out_ngroups /* (Q,) */,
                      int32_t* out_own_group /* (Q,) */,
                      int32_t* group_sizes /* (Q, G) */,
                      int32_t* group_slots /* (Q, G) */) {
#pragma omp parallel
  {
    std::vector<int32_t> order;
    std::vector<std::vector<int32_t>> groups;
    std::unordered_map<int64_t, int32_t> pid_to_gid;
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < num_q; ++q) {
      const float* row = distmat + q * num_g;
      const int64_t qp = q_pids[q];
      const int64_t qc = q_camids[q];
      argsort_row(row, num_g, order);

      groups.clear();
      pid_to_gid.clear();
      int32_t own = -1;
      int64_t kept = 0, matches = 0;
      double prec_sum = 0.0;
      for (int64_t n = 0; n < num_g; ++n) {
        const int64_t g = order[n];
        const bool match = g_pids[g] == qp;
        if (match && g_camids[g] == qc) continue;  // removed entry
        // group lookup by pid, first-appearance order
        auto it = pid_to_gid.find(g_pids[g]);
        int32_t gid;
        if (it == pid_to_gid.end()) {
          gid = static_cast<int32_t>(groups.size());
          pid_to_gid.emplace(g_pids[g], gid);
          groups.emplace_back();
          if (match) own = gid;
        } else {
          gid = it->second;
        }
        groups[gid].push_back(static_cast<int32_t>(kept));
        ++kept;
        if (match) {
          ++matches;
          prec_sum += double(matches) / double(kept);
        }
      }
      out_valid[q] = matches > 0 ? 1 : 0;
      out_ap[q] = matches > 0 ? float(prec_sum / double(matches)) : 0.0f;
      out_own_group[q] = own;
      out_ngroups[q] = static_cast<int32_t>(groups.size());
      int32_t* sizes = group_sizes + q * num_g;
      int32_t* slots = group_slots + q * num_g;
      int64_t off = 0;
      for (size_t gi = 0; gi < groups.size(); ++gi) {
        sizes[gi] = static_cast<int32_t>(groups[gi].size());
        for (int32_t s : groups[gi]) slots[off++] = s;
      }
    }
  }
}

}  // extern "C"
