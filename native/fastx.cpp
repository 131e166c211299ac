// Native FASTA/FASTQ ingestion + packing - the framework's replacement for
// the reference's header-only bioparser dependency (team_mapper.cpp:13-14,
// consumed as a git submodule there).  Parses plain or gzip files, extracts
// records (name = first whitespace token of the header; sequence lines
// concatenated), and exposes them as packed byte arrays + offset tables so
// Python can assemble numpy views with two memcpys.
//
// Semantics mirror bioinfo1_tpu/io/fastx.py exactly (the Python fallback is
// the executable spec for this file):
//   * FASTA: first non-space char must be '>'; whitespace inside sequence
//     lines is dropped; empty header -> empty name.
//   * FASTQ: '@name' / seq lines / '+' separator / quality bytes totalling
//     seq length; malformed records are an error.
//   * gzip input is auto-detected by magic bytes and inflated via zlib.
//
// Build: tools/build_native.sh -> build/libbioinfo1_native.so (links -lz).
// Binding: bioinfo1_tpu/io/native_io.py (ctypes).

#include <zlib.h>

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct FastxResult {
    int kind = 0;                     // 1 = fasta, 2 = fastq, 0 = error
    std::string error;
    std::string names;                // concatenated, no separators
    std::string seqs;
    std::vector<int64_t> name_off;    // size n+1 prefix offsets
    std::vector<int64_t> seq_off;
    // Record-slice filter (multi-host read sharding, SURVEY.md 2.2): only
    // records with keep_lo <= index < keep_hi are materialized; `total`
    // counts every record scanned either way, so one count-only pass
    // (keep_lo == keep_hi == 0) sizes the per-process slices.
    int64_t keep_lo = 0;
    int64_t keep_hi = -1;             // -1 = keep everything
    int64_t total = 0;
};

bool read_file(const char* path, std::string* out) {
    gzFile f = gzopen(path, "rb");    // gzopen reads plain files too
    if (!f) return false;
    char buf[1 << 16];
    int n;
    while ((n = gzread(f, buf, sizeof(buf))) > 0) {
        out->append(buf, n);
    }
    bool ok = n == 0;
    gzclose(f);
    return ok;
}

void push_record(FastxResult* r, const std::string& header,
                 const std::string& seq) {
    int64_t idx = r->total++;
    if (r->keep_hi >= 0 && (idx < r->keep_lo || idx >= r->keep_hi)) return;
    // name = first whitespace-delimited token of the header.
    size_t b = 0;
    while (b < header.size() && std::isspace((unsigned char)header[b])) ++b;
    size_t e = b;
    while (e < header.size() && !std::isspace((unsigned char)header[e])) ++e;
    r->names.append(header, b, e - b);
    r->seqs.append(seq);
    r->name_off.push_back((int64_t)r->names.size());
    r->seq_off.push_back((int64_t)r->seqs.size());
}

bool parse_fasta(const std::string& text, FastxResult* r) {
    size_t pos = 0, n = text.size();
    while (pos < n && std::isspace((unsigned char)text[pos])) ++pos;
    if (pos >= n || text[pos] != '>') {
        r->error = "file is not in FASTA format";
        return false;
    }
    r->name_off.push_back(0);
    r->seq_off.push_back(0);
    std::string header, seq;
    bool in_record = false;
    size_t line_start = pos;
    while (line_start < n) {
        size_t line_end = text.find('\n', line_start);
        if (line_end == std::string::npos) line_end = n;
        size_t len = line_end - line_start;
        // strip trailing \r
        while (len > 0 && text[line_start + len - 1] == '\r') --len;
        if (len > 0 && text[line_start] == '>') {
            if (in_record) push_record(r, header, seq);
            header.assign(text, line_start + 1, len - 1);
            seq.clear();
            in_record = true;
        } else {
            for (size_t i = 0; i < len; ++i) {
                char c = text[line_start + i];
                if (!std::isspace((unsigned char)c)) seq.push_back(c);
            }
        }
        line_start = line_end + 1;
    }
    if (in_record) push_record(r, header, seq);
    r->kind = 1;
    return true;
}

bool parse_fastq(const std::string& text, FastxResult* r) {
    std::vector<std::pair<size_t, size_t>> lines;  // (start, len) \r-stripped
    size_t line_start = 0, n = text.size();
    while (line_start < n) {
        size_t line_end = text.find('\n', line_start);
        if (line_end == std::string::npos) line_end = n;
        size_t len = line_end - line_start;
        while (len > 0 && text[line_start + len - 1] == '\r') --len;
        // rstrip (the Python spec rstrips whole lines)
        while (len > 0 &&
               std::isspace((unsigned char)text[line_start + len - 1])) --len;
        lines.emplace_back(line_start, len);
        line_start = line_end + 1;
    }
    size_t i = 0, m = lines.size();
    auto at = [&](size_t k) {
        return text.substr(lines[k].first, lines[k].second);
    };
    while (i < m && lines[i].second == 0) ++i;
    if (i >= m || text[lines[i].first] != '@') {
        r->error = "file is not in FASTQ format";
        return false;
    }
    r->name_off.push_back(0);
    r->seq_off.push_back(0);
    while (i < m) {
        if (lines[i].second == 0) { ++i; continue; }
        if (text[lines[i].first] != '@') {
            r->error = "malformed FASTQ record";
            return false;
        }
        std::string header = at(i).substr(1);
        ++i;
        std::string seq;
        while (i < m && !(lines[i].second > 0 && text[lines[i].first] == '+')) {
            seq += at(i);
            ++i;
        }
        if (i >= m) { r->error = "malformed FASTQ record"; return false; }
        ++i;  // '+' line
        size_t qual = 0;
        while (qual < seq.size() && i < m) {
            qual += lines[i].second;
            ++i;
        }
        if (qual != seq.size()) {
            r->error = "malformed FASTQ record";
            return false;
        }
        push_record(r, header, seq);
    }
    r->kind = 2;
    return true;
}

}  // namespace

extern "C" {

// Parse path; mode 0 = sniff (FASTQ first, FASTA fallback - the reference's
// try/catch chain, team_mapper.cpp:527-557), 1 = FASTA only, 2 = FASTQ only.
// Returns an opaque handle (never null); check bioinfo1_fastx_kind.
void* bioinfo1_fastx_parse(const char* path, int mode) {
    auto* r = new FastxResult();
    std::string text;
    if (!read_file(path, &text)) {
        r->error = "cannot read file";
        return r;
    }
    if (mode == 1) {
        parse_fasta(text, r);
    } else if (mode == 2) {
        parse_fastq(text, r);
    } else {
        if (!parse_fastq(text, r)) {
            *r = FastxResult();
            parse_fasta(text, r);
        }
    }
    return r;
}

// Slice parse (multi-host read sharding): materialize only records
// [keep_lo, keep_hi); keep_hi == -1 keeps all.  bioinfo1_fastx_total
// reports the number of records scanned regardless, so a count-only pass
// (keep_lo == keep_hi == 0) sizes per-process slices without holding any
// sequence bytes.
void* bioinfo1_fastx_parse_slice(const char* path, int mode,
                                 int64_t keep_lo, int64_t keep_hi) {
    auto* r = new FastxResult();
    r->keep_lo = keep_lo;
    r->keep_hi = keep_hi;
    std::string text;
    if (!read_file(path, &text)) {
        r->error = "cannot read file";
        return r;
    }
    if (mode == 1) {
        parse_fasta(text, r);
    } else if (mode == 2) {
        parse_fastq(text, r);
    } else {
        if (!parse_fastq(text, r)) {
            *r = FastxResult();
            r->keep_lo = keep_lo;
            r->keep_hi = keep_hi;
            parse_fasta(text, r);
        }
    }
    return r;
}

int64_t bioinfo1_fastx_total(void* h) { return ((FastxResult*)h)->total; }

int bioinfo1_fastx_kind(void* h) { return ((FastxResult*)h)->kind; }

int64_t bioinfo1_fastx_count(void* h) {
    auto* r = (FastxResult*)h;
    return r->name_off.empty() ? 0 : (int64_t)r->name_off.size() - 1;
}

int64_t bioinfo1_fastx_name_bytes(void* h) {
    return (int64_t)((FastxResult*)h)->names.size();
}

int64_t bioinfo1_fastx_seq_bytes(void* h) {
    return (int64_t)((FastxResult*)h)->seqs.size();
}

void bioinfo1_fastx_copy(void* h, char* names, int64_t* name_off,
                         char* seqs, int64_t* seq_off) {
    auto* r = (FastxResult*)h;
    std::memcpy(names, r->names.data(), r->names.size());
    std::memcpy(seqs, r->seqs.data(), r->seqs.size());
    std::memcpy(name_off, r->name_off.data(),
                r->name_off.size() * sizeof(int64_t));
    std::memcpy(seq_off, r->seq_off.data(),
                r->seq_off.size() * sizeof(int64_t));
}

void bioinfo1_fastx_free(void* h) { delete (FastxResult*)h; }

}  // extern "C"
