// ThreadSanitizer harness for the native host runtime (SURVEY.md section 5:
// "keep TSAN on the C++ host extension's tests").  The reference itself has
// a real data race (KMER's namespace-scope global state mutated inside the
// OpenMP read loop, team_minimizers.cpp:19-22 + team_mapper.cpp:596); this
// harness proves OUR native layer has none: every exported entry point is
// hammered from concurrent threads and the results are checked for
// thread-independence.
//
// Build + run: tools/build_native_tsan.sh (g++ -fsanitize=thread).

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* bioinfo1_fastx_parse(const char* path, int mode);
int bioinfo1_fastx_kind(void* h);
int64_t bioinfo1_fastx_count(void* h);
int64_t bioinfo1_fastx_name_bytes(void* h);
int64_t bioinfo1_fastx_seq_bytes(void* h);
void bioinfo1_fastx_copy(void* h, char* names, int64_t* name_off,
                         char* seqs, int64_t* seq_off);
void bioinfo1_fastx_free(void* h);

int64_t bioinfo1_freq_orders2(
    const uint32_t* fwd, int64_t nf, const uint32_t* rev, int64_t nr,
    uint32_t* f_iter, int32_t* f_cnt, uint32_t* f_sort, int64_t fcap,
    uint32_t* r_iter, int32_t* r_cnt, uint32_t* r_sort, int64_t rcap,
    int64_t* rev_m);

int64_t bioinfo1_paf_format(
    const char* names, const int64_t* name_off,
    const int32_t* read_len, const uint8_t* mapped, const uint8_t* is_fwd,
    const int32_t* q_begin, const int32_t* q_end,
    const int32_t* t_begin, const int32_t* t_end,
    const int32_t* score, int64_t n,
    const char* ref_name, int64_t ref_name_len, int64_t ref_len,
    const char* cigars, const int64_t* cigar_off, int32_t with_cigar,
    char* out, int64_t out_cap);
}

namespace {

std::string g_fasta_path;

std::string run_fastx() {
    void* h = bioinfo1_fastx_parse(g_fasta_path.c_str(), 0);
    assert(bioinfo1_fastx_kind(h) == 1);
    int64_t n = bioinfo1_fastx_count(h);
    std::string names(bioinfo1_fastx_name_bytes(h), 0);
    std::string seqs(bioinfo1_fastx_seq_bytes(h), 0);
    std::vector<int64_t> no(n + 1), so(n + 1);
    bioinfo1_fastx_copy(h, names.data(), no.data(), seqs.data(), so.data());
    bioinfo1_fastx_free(h);
    return names + "|" + seqs;
}

std::string run_freq() {
    uint32_t fwd[] = {7, 7, 3, 3, 3, 9, 1, 7};
    uint32_t rev[] = {2, 2, 9, 9, 4};
    uint32_t fi[8], fs[8], ri[8], rs[8];
    int32_t fc[8], rc[8];
    int64_t m = 0;
    int64_t nf = bioinfo1_freq_orders2(fwd, 8, rev, 5, fi, fc, fs, 8,
                                       ri, rc, rs, 8, &m);
    std::string out;
    for (int64_t i = 0; i < nf; ++i)
        out += std::to_string(fs[i]) + ",";
    for (int64_t i = 0; i < m; ++i)
        out += std::to_string(rs[i]) + ";";
    return out;
}

std::string run_paf() {
    const char* names = "r1r2";
    int64_t name_off[] = {0, 2, 4};
    int32_t rl[] = {100, 80};
    uint8_t mapped[] = {1, 1}, fwd[] = {1, 0};
    int32_t qb[] = {0, 3}, qe[] = {90, 70}, tb[] = {5, 9}, te[] = {95, 76};
    int32_t sc[] = {42, -7};
    int64_t coff[] = {0, 0, 0};
    char buf[512];
    int64_t need = bioinfo1_paf_format(names, name_off, rl, mapped, fwd,
                                       qb, qe, tb, te, sc, 2, "ref", 3, 4096,
                                       "", coff, 0, buf, sizeof(buf));
    return std::string(buf, need);
}

}  // namespace

int main(int argc, char** argv) {
    assert(argc > 1);
    g_fasta_path = argv[1];

    const int kThreads = 8, kIters = 50;
    std::string want_fastx = run_fastx();
    std::string want_freq = run_freq();
    std::string want_paf = run_paf();

    std::vector<std::thread> ts;
    std::vector<int> fails(kThreads, 0);
    for (int t = 0; t < kThreads; ++t) {
        ts.emplace_back([&, t] {
            for (int i = 0; i < kIters; ++i) {
                if (run_fastx() != want_fastx) fails[t]++;
                if (run_freq() != want_freq) fails[t]++;
                if (run_paf() != want_paf) fails[t]++;
            }
        });
    }
    for (auto& th : ts) th.join();
    int total = 0;
    for (int f : fails) total += f;
    if (total) {
        std::fprintf(stderr, "TSAN harness: %d mismatches\n", total);
        return 1;
    }
    std::printf("TSAN_HARNESS_OK\n");
    return 0;
}
