// Native PAF serializer - the framework's replacement for the reference's
// per-read stdout formatting under `omp critical` (team_mapper.cpp:685-698):
// 12 tab-separated columns (DP score in the residue-matches column, literal
// mapq 60), rev-strand target coordinates flipped back to forward
// (team_mapper.cpp:689-690), optional cg:Z: CIGAR tag.
//
// One call serializes a whole batch from column arrays into a caller-grown
// byte buffer - no per-read Python string work.  Bound via ctypes in
// bioinfo1_tpu/native.py; bioinfo1_tpu/pipeline/mapper.paf_line is the
// executable spec (and fallback) for this file.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

inline void put_int(std::string* out, int64_t v) {
    char buf[24];
    int n = std::snprintf(buf, sizeof(buf), "%lld", (long long)v);
    out->append(buf, n);
}

}  // namespace

extern "C" {

// Serialize n PAF rows.  Arrays are per-read (length n); reads with
// mapped[i] == 0 are skipped.  names/cigars are concatenated blobs with
// n+1 prefix offsets (cigars may be null when with_cigar == 0).
// Returns the number of bytes required; writes min(required, out_cap)
// bytes to out.  Call with out_cap == 0 to size, then again to fill
// (or over-allocate up front and accept the single pass).
int64_t bioinfo1_paf_format(
    const char* names, const int64_t* name_off,
    const int32_t* read_len, const uint8_t* mapped, const uint8_t* is_fwd,
    const int32_t* q_begin, const int32_t* q_end,
    const int32_t* t_begin, const int32_t* t_end,
    const int32_t* score, int64_t n,
    const char* ref_name, int64_t ref_name_len, int64_t ref_len,
    const char* cigars, const int64_t* cigar_off, int32_t with_cigar,
    char* out, int64_t out_cap) {
    std::string row;
    int64_t written = 0, required = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (!mapped[i]) continue;
        row.clear();
        row.append(names + name_off[i], name_off[i + 1] - name_off[i]);
        row.push_back('\t');
        put_int(&row, read_len[i]);
        row.push_back('\t');
        put_int(&row, q_begin[i]);
        row.push_back('\t');
        put_int(&row, q_end[i] + 1);
        row.push_back('\t');
        row.push_back(is_fwd[i] ? '+' : '-');
        row.push_back('\t');
        row.append(ref_name, ref_name_len);
        row.push_back('\t');
        put_int(&row, ref_len);
        row.push_back('\t');
        // Rev-strand coords flipped back to forward (team_mapper.cpp:689-690).
        int64_t ts = is_fwd[i] ? t_begin[i] : ref_len - t_end[i] - 1;
        int64_t te = is_fwd[i] ? t_end[i] + 1 : ref_len - t_begin[i];
        put_int(&row, ts);
        row.push_back('\t');
        put_int(&row, te);
        row.push_back('\t');
        put_int(&row, score[i]);
        row.push_back('\t');
        put_int(&row, (int64_t)q_end[i] - q_begin[i] + 1);
        row.append("\t60");
        if (with_cigar) {
            row.append("\tcg:Z:");
            row.append(cigars + cigar_off[i], cigar_off[i + 1] - cigar_off[i]);
        }
        row.push_back('\n');
        required += (int64_t)row.size();
        if (out && written + (int64_t)row.size() <= out_cap) {
            std::memcpy(out + written, row.data(), row.size());
            written += (int64_t)row.size();
        }
    }
    return required;
}

}  // extern "C"
