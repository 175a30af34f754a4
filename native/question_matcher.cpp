// Fast HTS question matcher (native runtime component).
//
// The linguistic front end matches every phone's full-context label
// against ~400 HTK wildcard questions plus continuous (number-capture)
// questions (reference: label_normalisation.pattern_matching_binary
// :753-771 / pattern_matching_continous_position :773-790, done with
// Python regexes).  This C++ implementation compiles each HTK pattern
// into a segment list once and answers a whole question set per label
// in a single pass — the host-side hot path of offline feature
// extraction and the text->speech front end.
//
// Pattern semantics (mirrors questions.wildcards2regex):
//  * '*' is a multi-char wildcard; a pattern without leading '*' is
//    anchored at the start, without trailing '*' anchored at the end.
//    A pattern without any '*' matches anywhere (regex search).
//  * LL- questions are additionally anchored at the start.
//  * CQS patterns contain one (\d+) or ([\d.]+) capture; the matched
//    number is returned, -1.0 when unmatched.
//
// C ABI (ctypes):
//  qm_create()                         -> handle
//  qm_add_binary(h, joined_patterns, anchor_start)   // '\n'-joined
//  qm_add_continuous(h, pattern)
//  qm_match(h, label, out_float_array) -> writes dict_size floats
//  qm_dict_size(h)
//  qm_destroy(h)

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Segment {
  std::string text;
};

struct Pattern {
  // Literal segments separated by '*'; anchored flags.
  std::vector<std::string> segments;
  bool anchor_start = false;
  bool anchor_end = false;
  // For continuous questions: index of the segment BEFORE the capture
  // (capture sits between segments capture_idx-1 and capture_idx), or
  // -1 for binary questions.
  int capture_after_segment = -1;
  bool capture_allows_dot = false;
};

// Parse an HTK wildcard pattern (optionally with a number capture).
Pattern parse_pattern(const std::string& raw, bool anchor_ll) {
  Pattern p;
  std::string body = raw;
  p.anchor_start = !body.empty() && body.front() != '*';
  p.anchor_end = !body.empty() && body.back() != '*';
  if (body.find('*') == std::string::npos) {
    // No wildcard at all: reference regex has no anchors -> search.
    p.anchor_start = false;
    p.anchor_end = false;
  }
  if (anchor_ll) p.anchor_start = true;

  // Split on '*', keep capture markers.
  std::string current;
  for (size_t i = 0; i < body.size(); ++i) {
    char c = body[i];
    if (c == '*') {
      if (!current.empty() || p.segments.empty()) {
        p.segments.push_back(current);
        current.clear();
      } else {
        p.segments.push_back("");
      }
    } else if (c == '(' &&
               (body.compare(i, 5, "(\\d+)") == 0 ||
                body.compare(i, 9, "([\\d\\.]+)") == 0 ||
                body.compare(i, 8, "([\\d.]+)") == 0)) {
      // Number capture: close the current segment.
      p.segments.push_back(current);
      current.clear();
      p.capture_after_segment = static_cast<int>(p.segments.size());
      p.capture_allows_dot = body[i + 1] == '[';
      i = body.find(')', i);  // skip the capture group
    } else {
      current.push_back(c);
    }
  }
  p.segments.push_back(current);
  // Remove empty leading/trailing segments caused by '*' at the ends.
  if (!p.segments.empty() && p.segments.front().empty() &&
      !p.anchor_start && p.segments.size() > 1) {
    p.segments.erase(p.segments.begin());
    if (p.capture_after_segment > 0) --p.capture_after_segment;
  }
  if (!p.segments.empty() && p.segments.back().empty() &&
      !p.anchor_end && p.segments.size() > 1 &&
      p.capture_after_segment !=
          static_cast<int>(p.segments.size())) {
    p.segments.pop_back();
  }
  return p;
}

// Try to parse a number at pos; returns end position or npos.
size_t parse_number(const std::string& label, size_t pos,
                    bool allow_dot, double* value) {
  size_t end = pos;
  while (end < label.size() &&
         (std::isdigit(static_cast<unsigned char>(label[end])) ||
          (allow_dot && label[end] == '.'))) {
    ++end;
  }
  if (end == pos) return std::string::npos;
  *value = std::stod(label.substr(pos, end - pos));
  return end;
}

// Match the tail of the pattern (segments from `s` on, starting at
// `pos`), with capture support.  Backtracks over segment positions
// like a regex search.
bool match_tail(const std::string& label, const Pattern& p, size_t s,
                size_t pos, bool fixed, double* captured) {
  if (static_cast<int>(s) == p.capture_after_segment && captured) {
    double value = -1.0;
    size_t end = parse_number(label, pos, p.capture_allows_dot,
                              &value);
    if (end == std::string::npos) return false;
    // After the capture, the remaining segments must match starting
    // exactly at `end` (regex (\d+) is greedy and numbers cannot be
    // followed by more digits, so no backtracking inside the number).
    Pattern rest = p;
    rest.capture_after_segment = -1;
    if (match_tail(label, rest, s, end, true, nullptr)) {
      *captured = value;
      return true;
    }
    return false;
  }
  if (s == p.segments.size()) {
    if (p.anchor_end && pos != label.size()) return false;
    return true;
  }
  const std::string& seg = p.segments[s];
  if (seg.empty()) {
    // '*' boundary: everything after is unanchored.
    return match_tail(label, p, s + 1, pos, false, captured);
  }
  if (fixed) {
    if (label.compare(pos, seg.size(), seg) != 0) return false;
    return match_tail(label, p, s + 1, pos + seg.size(), true,
                      captured);
  }
  size_t search = pos;
  while (true) {
    size_t found = label.find(seg, search);
    if (found == std::string::npos) return false;
    bool tail_fixed =
        (static_cast<int>(s + 1) == p.capture_after_segment);
    if (match_tail(label, p, s + 1, found + seg.size(),
                   tail_fixed, captured)) {
      return true;
    }
    search = found + 1;
  }
}

// Full pattern match; returns true and fills `captured` for CQS.
bool match_pattern(const std::string& label, const Pattern& p,
                   double* captured) {
  bool start_fixed = p.anchor_start;
  return match_tail(label, p, 0, 0, start_fixed, captured);
}

struct BinaryQuestion {
  std::vector<Pattern> alternatives;
};

struct Matcher {
  std::vector<BinaryQuestion> binary;
  std::vector<Pattern> continuous;
};

}  // namespace

extern "C" {

void* qm_create() { return new Matcher(); }

void qm_destroy(void* handle) {
  delete static_cast<Matcher*>(handle);
}

// patterns: '\n'-joined alternatives of ONE binary question.
void qm_add_binary(void* handle, const char* joined, int anchor_ll) {
  Matcher* m = static_cast<Matcher*>(handle);
  BinaryQuestion q;
  const char* start = joined;
  const char* p = joined;
  auto flush = [&](const char* s, const char* e) {
    if (e > s) q.alternatives.push_back(
        parse_pattern(std::string(s, e), anchor_ll != 0));
  };
  for (; *p; ++p) {
    if (*p == '\n') {
      flush(start, p);
      start = p + 1;
    }
  }
  flush(start, p);
  m->binary.push_back(std::move(q));
}

void qm_add_continuous(void* handle, const char* pattern) {
  Matcher* m = static_cast<Matcher*>(handle);
  m->continuous.push_back(parse_pattern(pattern, false));
}

int qm_dict_size(void* handle) {
  Matcher* m = static_cast<Matcher*>(handle);
  return static_cast<int>(m->binary.size() + m->continuous.size());
}

// Writes |binary| + |continuous| floats into out.
void qm_match(void* handle, const char* label_c, float* out) {
  Matcher* m = static_cast<Matcher*>(handle);
  std::string label(label_c);
  size_t i = 0;
  for (const auto& q : m->binary) {
    float v = 0.0f;
    for (const auto& alt : q.alternatives) {
      if (match_pattern(label, alt, nullptr)) {
        v = 1.0f;
        break;
      }
    }
    out[i++] = v;
  }
  for (const auto& p : m->continuous) {
    double captured = -1.0;
    if (!match_pattern(label, p, &captured)) {
      captured = -1.0;
    }
    out[i++] = static_cast<float>(captured);
  }
}

}  // extern "C"
