// Bug-compat oracle for the reference's frequency-ban semantics.
//
// The reference builds its banned-minimizer set by copying an
// unordered_map<unsigned,int> histogram into a vector and running an
// UNSTABLE std::sort by count only (team_mapper.cpp:436-448).  Which hashes
// land in the top-N among count ties therefore depends on (a) libstdc++
// unordered_map iteration order (itself a function of insertion order and
// rehash points) and (b) introsort's permutation of tied elements.  Neither
// is reproducible in portable Python/numpy, so --bug-compat mode delegates
// to this helper, compiled with the same libstdc++ as the reference oracle.
//
// The "most frequent surviving minimizer" statistic (team_mapper.cpp:504-520)
// likewise scans the unordered_map in iteration order with a strict '>', so
// the iteration order is exported too.
//
// Build: tools/build_native.sh  ->  build/libbioinfo1_native.so
// Python binding: bioinfo1_tpu/native.py (ctypes).

#include <algorithm>
#include <cstdint>
#include <unordered_map>
#include <vector>

extern "C" {

namespace {

int64_t export_orders(const std::unordered_map<unsigned int, int>& freq,
                      uint32_t* out_iter_hash, int32_t* out_iter_count,
                      uint32_t* out_sorted_hash, int64_t cap) {
    int64_t m = static_cast<int64_t>(freq.size());
    if (m > cap) return -1;
    std::vector<std::pair<unsigned int, int>> vec(freq.begin(), freq.end());
    int64_t j = 0;
    for (const auto& kv : vec) {
        out_iter_hash[j] = kv.first;
        out_iter_count[j] = kv.second;
        ++j;
    }
    std::sort(vec.begin(), vec.end(),
              [](const auto& a, const auto& b) { return a.second > b.second; });
    for (int64_t i = 0; i < m; ++i) {
        out_sorted_hash[i] = vec[i].first;
    }
    return m;
}

}  // namespace

// Replay the reference's histogram lifecycle over both strands' emit-order
// hash streams and export, per strand:
//   out_*_iter_hash/count: the map COPY in iteration order (stats scan,
//                          team_mapper.cpp:483-524)
//   out_*_sorted_hash:     hashes after the reference's count-descending
//                          unstable std::sort (ban = first N entries)
//
// The lifecycle matters for byte parity, in order:
//   1. the namespace-scope global map (team_minimizers.cpp:21) fills with
//      the FWD stream from a fresh state,
//   2. GetMinimizerFrequencies() returns it BY VALUE - the copy re-inserts
//      in iteration order into fresh buckets, permuting within-bucket order,
//   3. the REV Minimize() calls clear() - which KEEPS the grown bucket
//      array - then fills with the REV stream, so the REV map's rehash
//      trajectory differs from a fresh map's,
//   4. another by-value copy for the REV accessors.
// Returns n_fwd_distinct, with n_rev_distinct written to *out_rev_m; -1 on
// insufficient caps.
int64_t bioinfo1_freq_orders2(
    const uint32_t* fwd_hashes, int64_t n_fwd,
    const uint32_t* rev_hashes, int64_t n_rev,
    uint32_t* out_fwd_iter_hash, int32_t* out_fwd_iter_count,
    uint32_t* out_fwd_sorted_hash, int64_t fwd_cap,
    uint32_t* out_rev_iter_hash, int32_t* out_rev_iter_count,
    uint32_t* out_rev_sorted_hash, int64_t rev_cap,
    int64_t* out_rev_m) {
    std::unordered_map<unsigned int, int> global_freq;
    for (int64_t i = 0; i < n_fwd; ++i) {
        global_freq[fwd_hashes[i]]++;
    }
    std::unordered_map<unsigned int, int> fwd_copy = global_freq;
    int64_t fwd_m = export_orders(fwd_copy, out_fwd_iter_hash,
                                  out_fwd_iter_count, out_fwd_sorted_hash,
                                  fwd_cap);
    if (fwd_m < 0) return -1;

    global_freq.clear();  // keeps bucket_count, exactly like the reference
    for (int64_t i = 0; i < n_rev; ++i) {
        global_freq[rev_hashes[i]]++;
    }
    std::unordered_map<unsigned int, int> rev_copy = global_freq;
    int64_t rev_m = export_orders(rev_copy, out_rev_iter_hash,
                                  out_rev_iter_count, out_rev_sorted_hash,
                                  rev_cap);
    if (rev_m < 0) return -1;
    *out_rev_m = rev_m;
    return fwd_m;
}

}  // extern "C"
