// Native batch CIGAR decoder for the device traceback walk.
//
// The fused -c pipeline leaves (steps/4, B) op codes on the device, packed
// 4-per-byte (ops/trace.py pack_codes: 2 bits each, 0=M 1=I 2=D 3=done,
// goal->origin order).  Turning those into per-read CIGAR strings was the
// -c path's largest HOST cost (~1.4 ms/read of numpy slicing + f-string
// run formatting, rivaling the device work itself).  This decoder consumes
// the PACKED bytes directly - no unpack tensor, no per-read Python - one
// pass, OpenMP-parallel over reads.
//
// Reference semantics preserved (utils/cigar.cigar_from_codes is the
// executable spec and fallback):
//   * ops reversed to origin->goal order before encoding,
//   * semiGlobal pads to the (n, m) corner with I (target) / D (query)
//     runs (team_alignment.cpp:306-315),
//   * local target_begin = goal_j - consumed_j, or goal_j + 1 under the
//     reference's end-column bug (team_alignment.cpp:196-199),
//   * sam_convention swaps the reference's I/D letters
//     (team_alignment.cpp:128-137 are SAM-swapped).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

inline void put_run(std::string* out, int64_t count, char op) {
    char buf[20];
    char* p = buf + sizeof(buf);
    do {
        *--p = (char)('0' + count % 10);
        count /= 10;
    } while (count);
    out->append(p, buf + sizeof(buf) - p);
    out->push_back(op);
}

}  // namespace

extern "C" {

// Decode n reads' CIGARs from packed walk codes.
//
//   packed:  (b_total, s4) uint8, row-major (i.e. the device's (s4, B)
//            tensor TRANSPOSED so each read's codes are contiguous); read
//            r's codes live in row col[r].
//   mode:    0 global, 1 local, 2 semiGlobal.
//   out/out_cap/out_off: one concatenated blob with n+1 prefix offsets.
//            A run consumes at most 2 chars per op plus a bounded pad run,
//            so out_cap = n * (8*s4 + 32) always suffices - the call is
//            single-pass (no size-then-fill round trip).
//   target_begin_out: per-read (local mode only; 0 otherwise).
//
// Returns required blob bytes, or -1 when out_cap was too small (no bytes
// written in that case; caller re-calls with the returned bound).
int64_t bioinfo1_cigar_rle(
    const uint8_t* packed, int64_t s4, int64_t b_total,
    const int32_t* col,
    const int32_t* goal_i, const int32_t* goal_j,
    const int32_t* q_len, const int32_t* t_len,
    int64_t n, int32_t mode, int32_t sam, int32_t local_tb_end,
    char* out, int64_t out_cap, int64_t* out_off,
    int32_t* target_begin_out) {
    // code -> letter (code 1 consumes target, 2 consumes query - the
    // reference's swapped convention; sam==1 un-swaps).
    const char* letters = sam ? "MDI" : "MID";
    std::vector<std::string> rows((size_t)n);
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t r = 0; r < n; ++r) {
        // Unpack this read's codes (goal->origin order).  Code 3 entries
        // are SKIPPED, not terminal: the lockstep XLA walk only pads the
        // tail with them, but the Pallas per-diagonal walk interleaves
        // them mid-stream (match steps jump two diagonals; reads idle
        // until the sweep reaches their goal diagonal).  All-3 bytes are
        // rejected wholesale so the dense skip regions cost one compare.
        std::vector<uint8_t> ops;
        ops.reserve((size_t)(4 * s4));
        const uint8_t* rowp = packed + (int64_t)col[r] * s4;
        for (int64_t s = 0; s < s4; ++s) {
            uint8_t byte = rowp[s];
            if (byte == 0xFF) continue;
            for (int k = 0; k < 4; ++k) {
                uint8_t op = (byte >> (2 * k)) & 3;
                if (op != 3) ops.push_back(op);
            }
        }
        int64_t consumed_j = 0;
        if (mode == 1) {
            for (uint8_t op : ops) consumed_j += (op != 2);
            target_begin_out[r] =
                local_tb_end ? goal_j[r] + 1
                             : goal_j[r] - (int32_t)consumed_j;
        } else {
            target_begin_out[r] = 0;
        }
        // semiGlobal corner pad (team_alignment.cpp:306-315): appended
        // after the last origin->goal run, merging with it when the ops
        // match (the spec appends pad CHARS before compressing).
        int pad_op = -1;
        int64_t pad_len = 0;
        if (mode == 2 && (goal_i[r] != q_len[r] || goal_j[r] != t_len[r])) {
            if (goal_i[r] == q_len[r]) {
                pad_op = 1;
                pad_len = t_len[r] - goal_j[r];
            } else if (goal_j[r] == t_len[r]) {
                pad_op = 2;
                pad_len = q_len[r] - goal_i[r];
            }
        }
        std::string* row = &rows[(size_t)r];
        // RLE in origin->goal order == reverse walk order (ops[size-1] is
        // the origin-side step, ops[0] the goal-side one).
        int64_t i = (int64_t)ops.size() - 1;
        while (i >= 0) {
            uint8_t op = ops[i];
            int64_t j = i;
            while (j >= 0 && ops[j] == op) --j;
            int64_t count = i - j;
            i = j;
            if (i < 0 && op == pad_op) {      // merge pad into the last run
                count += pad_len;
                pad_len = 0;
            }
            put_run(row, count, letters[op]);
        }
        if (pad_op >= 0 && pad_len > 0)
            put_run(row, pad_len, letters[pad_op]);
    }
    int64_t required = 0;
    for (int64_t r = 0; r < n; ++r) required += (int64_t)rows[r].size();
    if (!out || required > out_cap) {
        if (out_off) {
            out_off[0] = 0;
            for (int64_t r = 0; r < n; ++r)
                out_off[r + 1] = out_off[r] + (int64_t)rows[r].size();
        }
        return out ? -1 : required;
    }
    int64_t written = 0;
    if (out_off) out_off[0] = 0;
    for (int64_t r = 0; r < n; ++r) {
        std::memcpy(out + written, rows[r].data(), rows[r].size());
        written += (int64_t)rows[r].size();
        if (out_off) out_off[r + 1] = written;
    }
    return required;
}

}  // extern "C"
