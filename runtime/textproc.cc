// Native text sanitizer — the hot path of the data pipeline.
//
// Replicates data/transform.py::sanitize exactly (which itself mirrors the
// reference naive_gpt/loaders/transform.py::Sanitize): per '\n\n' paragraph,
// for each normalize pattern in order { "()"->" ", "[]"->" ", "{}"->" ",
// "\s([,.?!;:])" -> "\1" } apply the pattern then collapse whitespace runs
// to single spaces and trim; drop empty paragraphs; re-join with '\n\n'.
// Equality with the Python implementation is asserted in
// tests/test_native_textproc.py over randomized corpora.

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

bool is_space(unsigned char c) {
  // Python's \s for the ASCII range (input is treated bytewise; multi-byte
  // UTF-8 continuation bytes are never in this set).
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}

bool is_punct_target(unsigned char c) {
  return c == ',' || c == '.' || c == '?' || c == '!' || c == ';' ||
         c == ':';
}

std::string collapse_blanks(const std::string& in) {
  // \s+ -> ' ', then strip leading/trailing (transform.py:8-17).
  std::string out;
  out.reserve(in.size());
  bool in_run = false;
  for (unsigned char c : in) {
    if (is_space(c)) {
      in_run = true;
      continue;
    }
    if (in_run && !out.empty()) out.push_back(' ');
    in_run = false;
    out.push_back(static_cast<char>(c));
  }
  return out;
}

std::string replace_pair(const std::string& in, char a, char b) {
  std::string out;
  out.reserve(in.size());
  for (size_t i = 0; i < in.size(); ++i) {
    if (i + 1 < in.size() && in[i] == a && in[i + 1] == b) {
      out.push_back(' ');
      ++i;
    } else {
      out.push_back(in[i]);
    }
  }
  return out;
}

std::string fix_punct_spacing(const std::string& in) {
  // \s([,.?!;:]) -> \1  (single whitespace before punct removed)
  std::string out;
  out.reserve(in.size());
  for (size_t i = 0; i < in.size(); ++i) {
    if (is_space(static_cast<unsigned char>(in[i])) && i + 1 < in.size() &&
        is_punct_target(static_cast<unsigned char>(in[i + 1]))) {
      continue;  // drop the whitespace; punct emitted next iteration
    }
    out.push_back(in[i]);
  }
  return out;
}

std::string sanitize_paragraph(std::string p) {
  p = replace_pair(p, '(', ')');
  p = collapse_blanks(p);
  p = replace_pair(p, '[', ']');
  p = collapse_blanks(p);
  p = replace_pair(p, '{', '}');
  p = collapse_blanks(p);
  p = fix_punct_spacing(p);
  p = collapse_blanks(p);
  return p;
}

std::string sanitize_text(const char* text, int32_t len) {
  std::string s(text, static_cast<size_t>(len));
  std::string out;
  size_t start = 0;
  bool first = true;
  while (start <= s.size()) {
    size_t sep = s.find("\n\n", start);
    size_t end = (sep == std::string::npos) ? s.size() : sep;
    std::string para = sanitize_paragraph(s.substr(start, end - start));
    if (!para.empty()) {
      if (!first) out += "\n\n";
      out += para;
      first = false;
    }
    if (sep == std::string::npos) break;
    start = sep + 2;
  }
  return out;
}

}  // namespace

extern "C" {

// Sanitize `text` (len bytes) into `out` (capacity out_cap). Returns the
// output length, or -(needed) if out_cap is too small.
int32_t textproc_sanitize(const char* text, int32_t len, char* out,
                          int32_t out_cap) {
  std::string result = sanitize_text(text, len);
  int32_t n = static_cast<int32_t>(result.size());
  if (n > out_cap) return -n;
  std::memcpy(out, result.data(), static_cast<size_t>(n));
  return n;
}

}  // extern "C"
