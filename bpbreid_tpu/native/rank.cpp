// Native CMC/mAP ranking kernel.
//
// The reference ships a Cython implementation of the market1501/cuhk03
// ranking protocols (reference: torchreid/metrics/rank_cylib/rank_cy.pyx,
// built by rank_cylib/Makefile). This is the equivalent native component
// for the TPU framework: a multithreaded C++ kernel exposed through a
// plain C ABI and loaded with ctypes (no pybind11 dependency).
//
// Per query: argsort the distance row, drop same-(pid,camid) junk,
// then a single pass accumulates the CMC first-match rank and AP.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread rank.cpp -o librank.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

extern "C" {

// Returns 0 on success, -1 if no valid query.
// cmc_out: [max_rank] averaged CMC curve. map_out: scalar mAP.
int eval_market1501(const float* distmat, const int64_t* q_pids,
                    const int64_t* g_pids, const int64_t* q_camids,
                    const int64_t* g_camids, int64_t num_q, int64_t num_g,
                    int64_t max_rank, float* cmc_out, double* map_out,
                    int64_t num_threads) {
  if (max_rank > num_g) max_rank = num_g;
  std::vector<double> cmc_acc(max_rank, 0.0);
  std::vector<double> ap_acc(1, 0.0);
  std::atomic<int64_t> n_valid{0};

  int64_t hw = num_threads > 0
                   ? num_threads
                   : static_cast<int64_t>(std::thread::hardware_concurrency());
  if (hw < 1) hw = 1;
  if (hw > num_q) hw = num_q;

  std::vector<std::vector<double>> cmc_parts(hw,
                                             std::vector<double>(max_rank, 0));
  std::vector<double> ap_parts(hw, 0.0);

  auto worker = [&](int64_t tid) {
    std::vector<int32_t> order(num_g);
    for (int64_t q = tid; q < num_q; q += hw) {
      const float* row = distmat + q * num_g;
      std::iota(order.begin(), order.end(), 0);
      std::stable_sort(order.begin(), order.end(),
                       [&](int32_t a, int32_t b) { return row[a] < row[b]; });
      const int64_t pid = q_pids[q];
      const int64_t cam = q_camids[q];
      // single pass over the sorted gallery
      int64_t kept = 0;        // rank among kept entries
      int64_t num_rel = 0;     // true matches seen so far
      int64_t first_match = -1;
      double ap = 0.0;
      for (int64_t j = 0; j < num_g; ++j) {
        const int32_t g = order[j];
        const bool match = g_pids[g] == pid;
        if (match && g_camids[g] == cam) continue;  // junk
        if (match) {
          ++num_rel;
          ap += static_cast<double>(num_rel) / static_cast<double>(kept + 1);
          if (first_match < 0) first_match = kept;
        }
        ++kept;
      }
      if (num_rel == 0) continue;  // invalid query
      n_valid.fetch_add(1, std::memory_order_relaxed);
      ap_parts[tid] += ap / static_cast<double>(num_rel);
      if (first_match < max_rank) {
        for (int64_t r = first_match; r < max_rank; ++r)
          cmc_parts[tid][r] += 1.0;
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(hw);
  for (int64_t t = 0; t < hw; ++t) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();

  const int64_t valid = n_valid.load();
  if (valid == 0) return -1;
  double map_sum = 0.0;
  for (int64_t t = 0; t < hw; ++t) {
    map_sum += ap_parts[t];
    for (int64_t r = 0; r < max_rank; ++r) cmc_acc[r] += cmc_parts[t][r];
  }
  for (int64_t r = 0; r < max_rank; ++r)
    cmc_out[r] = static_cast<float>(cmc_acc[r] / valid);
  *map_out = map_sum / valid;
  return 0;
}

}  // extern "C"
