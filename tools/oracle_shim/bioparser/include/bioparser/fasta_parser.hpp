// Minimal stand-in for the bioparser FASTA interface, written from scratch so
// the reference mapper at /root/reference can be compiled as a test oracle.
// Only the surface the reference uses is provided:
//   bioparser::Parser<T>::Create<bioparser::FastaParser>(path)->Parse(n)
// Plain-text files only (no gzip); names are trimmed at the first whitespace.
#ifndef ORACLE_SHIM_FASTA_PARSER_HPP
#define ORACLE_SHIM_FASTA_PARSER_HPP

#include <cstdint>
#include <fstream>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace bioparser {

namespace shim_detail {

inline std::string ReadWholeFile(const std::string& path) {
  std::ifstream in(path, std::ios::binary);
  if (!in) {
    throw std::runtime_error("cannot open file: " + path);
  }
  return std::string((std::istreambuf_iterator<char>(in)),
                     std::istreambuf_iterator<char>());
}

inline std::string FirstToken(const std::string& line) {
  std::size_t end = 0;
  while (end < line.size() && !std::isspace(static_cast<unsigned char>(line[end]))) {
    ++end;
  }
  return line.substr(0, end);
}

}  // namespace shim_detail

template <class T>
class FastaParser {
 public:
  explicit FastaParser(const std::string& path) : path_(path), done_(false) {}

  std::vector<std::unique_ptr<T>> Parse(std::uint64_t /*max_bytes*/) {
    std::vector<std::unique_ptr<T>> out;
    if (done_) {
      return out;
    }
    done_ = true;
    std::string buf = shim_detail::ReadWholeFile(path_);
    std::size_t pos = 0;
    // Skip leading whitespace.
    while (pos < buf.size() &&
           std::isspace(static_cast<unsigned char>(buf[pos]))) {
      ++pos;
    }
    if (pos >= buf.size() || buf[pos] != '>') {
      throw std::invalid_argument("file is not in FASTA format: " + path_);
    }
    while (pos < buf.size()) {
      if (buf[pos] != '>') {
        throw std::invalid_argument("malformed FASTA record: " + path_);
      }
      std::size_t eol = buf.find('\n', pos);
      if (eol == std::string::npos) eol = buf.size();
      std::string header = buf.substr(pos + 1, eol - pos - 1);
      std::string name = shim_detail::FirstToken(header);
      pos = (eol == buf.size()) ? eol : eol + 1;
      std::string data;
      while (pos < buf.size() && buf[pos] != '>') {
        eol = buf.find('\n', pos);
        if (eol == std::string::npos) eol = buf.size();
        for (std::size_t i = pos; i < eol; ++i) {
          if (!std::isspace(static_cast<unsigned char>(buf[i]))) {
            data.push_back(buf[i]);
          }
        }
        pos = (eol == buf.size()) ? eol : eol + 1;
      }
      out.push_back(std::make_unique<T>(
          name.c_str(), static_cast<std::uint32_t>(name.size()),
          data.c_str(), static_cast<std::uint32_t>(data.size())));
    }
    return out;
  }

 private:
  std::string path_;
  bool done_;
};

template <class T>
class Parser {
 public:
  template <template <class> class P>
  static std::unique_ptr<P<T>> Create(const std::string& path) {
    return std::make_unique<P<T>>(path);
  }
};

}  // namespace bioparser

#endif  // ORACLE_SHIM_FASTA_PARSER_HPP
