// Native JSON request-body -> columnar arrays for the serving hot path.
//
// The HTTP serving contract (reference: gcloud ml-engine predict request
// shape, /root/reference/scripts/mle_deploy.sh + README usage) is
//   {"instances": [{"user_id": 1, "gender": "F", ...}, ...]}
// The Python path (json.loads + per-key list comprehension + np.asarray)
// creates ~rows*cols PyObjects per request; at batch 4096 that conversion
// is the measured encode floor (RESULTS.md "Serving/encode host path").
// This parser goes straight from the request bytes to column buffers:
// int64 / float64 vectors and fixed-stride NUL-padded byte columns (the
// exact S-dtype layout rectpu_hash_strings_fixed consumes).
//
// DELIBERATELY RESTRICTIVE: anything outside the flat scalar-valued,
// uniform-keyed shape (escapes, non-ASCII, nested values, mixed
// string/number columns, extra top-level keys) returns an error and the
// Python json.loads path handles the request instead — behavior parity is
// guaranteed by fallback, speed by the common case.

#include <charconv>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Column {
  std::string name;
  // 0 = int64, 1 = float64, 2 = bytes
  int kind = 0;
  std::vector<int64_t> ints;
  std::vector<double> floats;
  // byte columns: (offset, len) into the copied body buffer
  std::vector<std::pair<int64_t, int32_t>> spans;
  int64_t max_len = 1;  // S-dtype itemsize is at least 1
  int64_t last_row = -1;
};

struct JsonColumns {
  std::string buf;  // owned copy of the request body
  std::string error;
  std::vector<Column> cols;
  int64_t rows = 0;
};

struct Parser {
  const char* p;
  const char* end;
  JsonColumns* out;

  bool fail(const char* msg) {
    if (out->error.empty()) out->error = msg;
    return false;
  }

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }

  bool expect(char c) {
    skip_ws();
    if (p >= end || *p != c) return fail("unexpected token");
    p++;
    return true;
  }

  // Parse a JSON string; returns the span of its raw bytes. Escapes and
  // non-ASCII bytes bail (Python fallback handles them).
  bool parse_string(int64_t* off, int32_t* len) {
    skip_ws();
    if (p >= end || *p != '"') return fail("expected string");
    p++;
    const char* start = p;
    while (p < end) {
      unsigned char c = static_cast<unsigned char>(*p);
      if (c == '"') {
        *off = start - out->buf.data();
        *len = static_cast<int32_t>(p - start);
        p++;
        return true;
      }
      if (c == '\\') return fail("escape sequence (fallback)");
      if (c >= 0x80) return fail("non-ascii string (fallback)");
      if (c < 0x20) return fail("control char in string");
      p++;
    }
    return fail("unterminated string");
  }

  // Number token: [-]digits[.digits][eE...]; from_chars for exactness.
  bool parse_number(Column* col, int64_t row) {
    skip_ws();
    const char* start = p;
    if (p < end && *p == '-') p++;
    bool is_float = false;
    while (p < end) {
      char c = *p;
      if (c >= '0' && c <= '9') { p++; continue; }
      if (c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-') {
        if (c == '.' || c == 'e' || c == 'E') is_float = true;
        // '+'/'-' only valid inside an exponent; from_chars validates
        if (!is_float && (c == '+' || c == '-')) break;
        p++;
        continue;
      }
      break;
    }
    if (p == start) return fail("expected number");
    if (col->kind == 2) return fail("mixed string/number column (fallback)");
    if (is_float && col->kind == 0) {
      // promote the column: ints seen so far become doubles
      col->kind = 1;
      col->floats.reserve(col->ints.size());
      for (int64_t v : col->ints) col->floats.push_back(static_cast<double>(v));
      col->ints.clear();
    }
    if (col->kind == 1) {
      double v;
      auto r = std::from_chars(start, p, v);
      if (r.ec != std::errc() || r.ptr != p) return fail("bad float literal");
      col->floats.push_back(v);
    } else {
      int64_t v;
      auto r = std::from_chars(start, p, v);
      if (r.ec != std::errc() || r.ptr != p)
        return fail(is_float ? "bad float literal" : "int overflow (fallback)");
      col->ints.push_back(v);
    }
    col->last_row = row;
    return true;
  }

  Column* find_col(const char* name, int32_t len, size_t hint) {
    auto& cols = out->cols;
    if (hint < cols.size() && cols[hint].name.size() == static_cast<size_t>(len)
        && memcmp(cols[hint].name.data(), name, len) == 0)
      return &cols[hint];
    for (auto& c : cols)
      if (c.name.size() == static_cast<size_t>(len)
          && memcmp(c.name.data(), name, len) == 0)
        return &c;
    return nullptr;
  }

  bool parse_instance(int64_t row) {
    if (!expect('{')) return false;
    skip_ws();
    size_t n_cols_before = out->cols.size();
    size_t filled = 0;
    if (p < end && *p == '}') { p++; goto done; }
    while (true) {
      int64_t koff; int32_t klen;
      if (!parse_string(&koff, &klen)) return false;
      if (!expect(':')) return false;
      const char* kname = out->buf.data() + koff;
      Column* col;
      if (row == 0) {
        if (find_col(kname, klen, filled) != nullptr)
          return fail("duplicate key");
        out->cols.emplace_back();
        col = &out->cols.back();
        col->name.assign(kname, klen);
      } else {
        col = find_col(kname, klen, filled);
        if (col == nullptr) return fail("inconsistent instance keys (fallback)");
        if (col->last_row == row) return fail("duplicate key");
      }
      skip_ws();
      if (p >= end) return fail("truncated body");
      if (*p == '"') {
        int64_t voff; int32_t vlen;
        if (!parse_string(&voff, &vlen)) return false;
        if (row == 0 && col->spans.empty() && col->ints.empty()
            && col->floats.empty()) {
          col->kind = 2;
        } else if (col->kind != 2) {
          return fail("mixed string/number column (fallback)");
        }
        col->spans.emplace_back(voff, vlen);
        if (vlen > col->max_len) col->max_len = vlen;
        col->last_row = row;
      } else if ((*p >= '0' && *p <= '9') || *p == '-') {
        if (!parse_number(col, row)) return false;
      } else {
        return fail("unsupported value type (fallback)");
      }
      filled++;
      skip_ws();
      if (p < end && *p == ',') { p++; continue; }
      if (p < end && *p == '}') { p++; break; }
      return fail("unexpected token in instance");
    }
  done:
    if (row == 0) {
      (void)n_cols_before;
      return true;
    }
    if (filled != out->cols.size())
      return fail("inconsistent instance keys (fallback)");
    return true;
  }

  bool parse_body() {
    if (!expect('{')) return false;
    int64_t koff; int32_t klen;
    if (!parse_string(&koff, &klen)) return false;
    if (klen != 9 || memcmp(out->buf.data() + koff, "instances", 9) != 0)
      return fail("first key is not instances (fallback)");
    if (!expect(':')) return false;
    if (!expect('[')) return false;
    skip_ws();
    if (p < end && *p == ']') {
      p++;
    } else {
      int64_t row = 0;
      while (true) {
        if (!parse_instance(row)) return false;
        row++;
        skip_ws();
        if (p < end && *p == ',') { p++; continue; }
        if (p < end && *p == ']') { p++; break; }
        return fail("unexpected token in instances array");
      }
      out->rows = row;
    }
    if (!expect('}')) return fail("extra top-level keys (fallback)");
    skip_ws();
    if (p != end) return fail("trailing bytes");
    return true;
  }
};

}  // namespace

extern "C" void* rectpu_json_parse(const char* data, int64_t len) {
  auto* h = new JsonColumns();
  h->buf.assign(data, static_cast<size_t>(len));
  Parser parser{h->buf.data(), h->buf.data() + h->buf.size(), h};
  if (!parser.parse_body() && h->error.empty()) h->error = "parse error";
  return h;
}

extern "C" const char* rectpu_json_error(void* h) {
  auto* j = static_cast<JsonColumns*>(h);
  return j->error.empty() ? nullptr : j->error.c_str();
}

extern "C" int64_t rectpu_json_rows(void* h) {
  return static_cast<JsonColumns*>(h)->rows;
}

extern "C" int64_t rectpu_json_cols(void* h) {
  return static_cast<int64_t>(static_cast<JsonColumns*>(h)->cols.size());
}

// name_out points into the handle (valid until rectpu_json_free);
// kind: 0 int64, 1 float64, 2 bytes (stride = itemsize of the S column).
extern "C" int rectpu_json_col_info(void* h, int64_t i, const char** name_out,
                                    int64_t* name_len, int64_t* kind_out,
                                    int64_t* stride_out) {
  auto* j = static_cast<JsonColumns*>(h);
  if (i < 0 || i >= static_cast<int64_t>(j->cols.size())) return -1;
  const Column& c = j->cols[static_cast<size_t>(i)];
  *name_out = c.name.data();
  *name_len = static_cast<int64_t>(c.name.size());
  *kind_out = c.kind;
  *stride_out = c.max_len;
  return 0;
}

// out must hold rows*8 bytes (kinds 0/1) or rows*stride bytes, PRE-ZEROED
// for byte columns (NUL padding).
extern "C" int rectpu_json_col_copy(void* h, int64_t i, void* out) {
  auto* j = static_cast<JsonColumns*>(h);
  if (i < 0 || i >= static_cast<int64_t>(j->cols.size())) return -1;
  const Column& c = j->cols[static_cast<size_t>(i)];
  if (c.kind == 0) {
    memcpy(out, c.ints.data(), c.ints.size() * sizeof(int64_t));
  } else if (c.kind == 1) {
    memcpy(out, c.floats.data(), c.floats.size() * sizeof(double));
  } else {
    char* dst = static_cast<char*>(out);
    for (size_t r = 0; r < c.spans.size(); r++) {
      const auto& s = c.spans[r];
      memcpy(dst + r * c.max_len, j->buf.data() + s.first,
             static_cast<size_t>(s.second));
    }
  }
  return 0;
}

extern "C" void rectpu_json_free(void* h) { delete static_cast<JsonColumns*>(h); }
