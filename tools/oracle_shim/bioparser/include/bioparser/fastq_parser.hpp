// Minimal stand-in for the bioparser FASTQ interface (see fasta_parser.hpp).
// Throws on non-FASTQ input so the reference's format-sniffing fallback
// (team_mapper.cpp:527-557) behaves as with the real bioparser.
#ifndef ORACLE_SHIM_FASTQ_PARSER_HPP
#define ORACLE_SHIM_FASTQ_PARSER_HPP

#include "bioparser/fasta_parser.hpp"

namespace bioparser {

template <class T>
class FastqParser {
 public:
  explicit FastqParser(const std::string& path) : path_(path), done_(false) {}

  std::vector<std::unique_ptr<T>> Parse(std::uint64_t /*max_bytes*/) {
    std::vector<std::unique_ptr<T>> out;
    if (done_) {
      return out;
    }
    done_ = true;
    std::string buf = shim_detail::ReadWholeFile(path_);
    std::size_t pos = 0;
    while (pos < buf.size() &&
           std::isspace(static_cast<unsigned char>(buf[pos]))) {
      ++pos;
    }
    if (pos >= buf.size() || buf[pos] != '@') {
      throw std::invalid_argument("file is not in FASTQ format: " + path_);
    }
    auto next_line = [&](std::string* line) -> bool {
      if (pos >= buf.size()) return false;
      std::size_t eol = buf.find('\n', pos);
      if (eol == std::string::npos) eol = buf.size();
      line->assign(buf, pos, eol - pos);
      while (!line->empty() &&
             std::isspace(static_cast<unsigned char>(line->back()))) {
        line->pop_back();
      }
      pos = (eol == buf.size()) ? eol : eol + 1;
      return true;
    };
    std::string line;
    while (next_line(&line)) {
      if (line.empty()) continue;
      if (line[0] != '@') {
        throw std::invalid_argument("malformed FASTQ record: " + path_);
      }
      std::string name = shim_detail::FirstToken(line.substr(1));
      std::string seq, qual;
      // Sequence lines until the '+' separator.
      while (next_line(&line)) {
        if (!line.empty() && line[0] == '+') break;
        seq += line;
      }
      if (line.empty() || line[0] != '+') {
        throw std::invalid_argument("malformed FASTQ record: " + path_);
      }
      // Quality lines until length matches the sequence.
      while (qual.size() < seq.size() && next_line(&line)) {
        qual += line;
      }
      if (qual.size() != seq.size()) {
        throw std::invalid_argument("malformed FASTQ record: " + path_);
      }
      out.push_back(std::make_unique<T>(
          name.c_str(), static_cast<std::uint32_t>(name.size()),
          seq.c_str(), static_cast<std::uint32_t>(seq.size()),
          qual.c_str(), static_cast<std::uint32_t>(qual.size())));
    }
    return out;
  }

 private:
  std::string path_;
  bool done_;
};

}  // namespace bioparser

#endif  // ORACLE_SHIM_FASTQ_PARSER_HPP
