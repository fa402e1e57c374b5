// Native host runtime for muchsalsa_tpu: hot I/O and byte-level paths.
//
// TPU-native counterpart of the reference's C++ data plane —
// BlastFileAccessor/BlastFileReader (libms/src/BlastFileReader.cpp),
// SequenceAccessor (libms/src/SequenceAccessor.cpp) and
// getReverseComplement (libms/src/SequenceUtils.cpp:41-61) — exposed as
// a C ABI consumed through ctypes.  The compute path stays JAX/Pallas;
// this library covers the host-side ingest that feeds device arrays.
//
// Build: see muchsalsa_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// reverse complement (upper-case ACGT swapped, everything else verbatim)

void ms_revcomp(const uint8_t *in, uint8_t *out, int64_t n) {
  static uint8_t table[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) table[i] = static_cast<uint8_t>(i);
    table['A'] = 'T'; table['T'] = 'A'; table['G'] = 'C'; table['C'] = 'G';
    init = true;
  }
  for (int64_t i = 0; i < n; ++i) out[i] = table[in[n - 1 - i]];
}

// ---------------------------------------------------------------------------
// PAF parsing with string interning
//
// Returns the number of kept rows, filling caller-allocated arrays of
// capacity `max_rows` (one per kept line).  Skips the final line when
// `skip_last` (reference parity, BlastFileReader.cpp:76).  Filters:
// matches >= min_matches && illumina range length >= min_matches.
// Interned names are returned via ms_paf_names() as '\n'-joined blobs.

struct PafState {
  std::vector<std::string> nano_names;
  std::vector<std::string> illu_names;
  std::string nano_blob;
  std::string illu_blob;
};

static PafState *g_paf_state = nullptr;

static int64_t intern(std::unordered_map<std::string, int64_t> &map,
                      std::vector<std::string> &names, std::string_view key) {
  // owned-string keys: SSO strings move their inline buffers when the
  // names vector grows, so string_view keys into them would dangle
  auto [it, inserted] = map.emplace(std::string(key),
                                    static_cast<int64_t>(names.size()));
  if (inserted) names.emplace_back(key);
  return it->second;
}

int64_t ms_parse_paf(const char *data, int64_t len, int32_t min_matches,
                     int32_t skip_last, int32_t *illu_id, int32_t *nano_id,
                     int32_t *illu_start, int32_t *illu_end,
                     int32_t *nano_start, int32_t *nano_end,
                     int32_t *nano_length, uint8_t *direction, int64_t *score,
                     int64_t *line_idx, int64_t max_rows) {
  delete g_paf_state;
  g_paf_state = new PafState();
  std::unordered_map<std::string, int64_t> nano_map, illu_map;
  g_paf_state->nano_names.reserve(1 << 16);
  g_paf_state->illu_names.reserve(1 << 16);

  // collect line offsets first so the last line can be skipped
  std::vector<std::pair<const char *, const char *>> lines;
  const char *p = data;
  const char *end = data + len;
  while (p < end) {
    const char *nl = static_cast<const char *>(memchr(p, '\n', end - p));
    const char *stop = nl ? nl : end;
    if (stop > p) lines.emplace_back(p, stop);
    p = nl ? nl + 1 : end;
  }
  int64_t limit = static_cast<int64_t>(lines.size()) - (skip_last ? 1 : 0);

  int64_t out = 0;
  for (int64_t ln = 0; ln < limit && out < max_rows; ++ln) {
    const char *s = lines[ln].first;
    const char *e = lines[ln].second;

    const char *cols[10];
    int64_t col_len[10];
    int ncols = 0;
    const char *field = s;
    for (const char *q = s; q <= e && ncols < 10; ++q) {
      if (q == e || *q == '\t') {
        cols[ncols] = field;
        col_len[ncols] = q - field;
        ++ncols;
        field = q + 1;
      }
    }
    if (ncols < 10) return -1;  // invalid PAF

    auto to_int = [](const char *b, int64_t n) -> int64_t {
      int64_t v = 0;
      bool neg = n > 0 && b[0] == '-';
      for (int64_t i = neg ? 1 : 0; i < n; ++i) v = v * 10 + (b[i] - '0');
      return neg ? -v : v;
    };

    int64_t is_ = to_int(cols[2], col_len[2]);
    int64_t ie = to_int(cols[3], col_len[3]) - 1;
    int64_t matches = to_int(cols[9], col_len[9]);
    if (matches < min_matches || ie - is_ + 1 < min_matches) continue;

    illu_id[out] = static_cast<int32_t>(
        intern(illu_map, g_paf_state->illu_names, {cols[0], static_cast<size_t>(col_len[0])}));
    nano_id[out] = static_cast<int32_t>(
        intern(nano_map, g_paf_state->nano_names, {cols[5], static_cast<size_t>(col_len[5])}));
    illu_start[out] = static_cast<int32_t>(is_);
    illu_end[out] = static_cast<int32_t>(ie);
    nano_start[out] = static_cast<int32_t>(to_int(cols[7], col_len[7]));
    nano_end[out] = static_cast<int32_t>(to_int(cols[8], col_len[8]) - 1);
    nano_length[out] = static_cast<int32_t>(to_int(cols[6], col_len[6]));
    direction[out] = (col_len[4] == 1 && cols[4][0] == '+') ? 1 : 0;
    score[out] = matches;
    line_idx[out] = ln;
    ++out;
  }

  // build name blobs
  auto join = [](const std::vector<std::string> &names, std::string &blob) {
    blob.clear();
    for (size_t i = 0; i < names.size(); ++i) {
      if (i) blob.push_back('\n');
      blob += names[i];
    }
  };
  join(g_paf_state->nano_names, g_paf_state->nano_blob);
  join(g_paf_state->illu_names, g_paf_state->illu_blob);

  return out;
}

int64_t ms_paf_count_lines(const char *data, int64_t len) {
  int64_t count = 0;
  const char *p = data;
  const char *end = data + len;
  while (p < end) {
    const char *nl = static_cast<const char *>(memchr(p, '\n', end - p));
    const char *stop = nl ? nl : end;
    if (stop > p) ++count;
    p = nl ? nl + 1 : end;
  }
  return count;
}

const char *ms_paf_nano_names() { return g_paf_state ? g_paf_state->nano_blob.c_str() : ""; }
const char *ms_paf_illu_names() { return g_paf_state ? g_paf_state->illu_blob.c_str() : ""; }

void ms_paf_free() {
  delete g_paf_state;
  g_paf_state = nullptr;
}

// ---------------------------------------------------------------------------
// FASTA/FASTQ parsing: one pass producing a concatenated sequence blob,
// per-record offsets, and '\n'-joined first-token names.

struct FastaState {
  std::string names;
  std::string seq;
  std::vector<int64_t> offsets;  // size = n_records + 1
};

static FastaState *g_fasta_state = nullptr;

int64_t ms_parse_fasta(const char *data, int64_t len, int32_t is_fastq) {
  delete g_fasta_state;
  g_fasta_state = new FastaState();
  auto &st = *g_fasta_state;
  st.seq.reserve(static_cast<size_t>(len));
  st.offsets.push_back(0);

  const char *p = data;
  const char *end = data + len;
  int64_t records = 0;

  if (!is_fastq) {
    while (p < end) {
      const char *nl = static_cast<const char *>(memchr(p, '\n', end - p));
      const char *stop = nl ? nl : end;
      if (p < stop && *p == '>') {
        if (records) st.offsets.push_back(static_cast<int64_t>(st.seq.size()));
        const char *name_end = p + 1;
        while (name_end < stop && !isspace(static_cast<unsigned char>(*name_end))) ++name_end;
        if (records) st.names.push_back('\n');
        st.names.append(p + 1, name_end);
        ++records;
      } else if (records) {
        // bulk-append; trim trailing CR/space (whitespace inside a
        // sequence line is rare — fall back to filtering only then)
        const char *q2 = stop;
        while (q2 > p && isspace(static_cast<unsigned char>(q2[-1]))) --q2;
        bool inner_ws = false;
        for (const char *q = p; q < q2; ++q)
          if (isspace(static_cast<unsigned char>(*q))) { inner_ws = true; break; }
        if (!inner_ws) {
          st.seq.append(p, q2);
        } else {
          for (const char *q = p; q < q2; ++q)
            if (!isspace(static_cast<unsigned char>(*q))) st.seq.push_back(*q);
        }
      }
      p = nl ? nl + 1 : end;
    }
  } else {
    int phase = 0;  // 0 header, 1 seq, 2 plus, 3 qual
    while (p < end) {
      const char *nl = static_cast<const char *>(memchr(p, '\n', end - p));
      const char *stop = nl ? nl : end;
      if (phase == 0) {
        if (p < stop && *p == '@') {
          if (records) st.offsets.push_back(static_cast<int64_t>(st.seq.size()));
          const char *name_end = p + 1;
          while (name_end < stop && !isspace(static_cast<unsigned char>(*name_end))) ++name_end;
          if (records) st.names.push_back('\n');
          st.names.append(p + 1, name_end);
          ++records;
          phase = 1;
        }
      } else if (phase == 1) {
        const char *q2 = stop;
        while (q2 > p && isspace(static_cast<unsigned char>(q2[-1]))) --q2;
        bool inner_ws = false;
        for (const char *q = p; q < q2; ++q)
          if (isspace(static_cast<unsigned char>(*q))) { inner_ws = true; break; }
        if (!inner_ws) {
          st.seq.append(p, q2);
        } else {
          for (const char *q = p; q < q2; ++q)
            if (!isspace(static_cast<unsigned char>(*q))) st.seq.push_back(*q);
        }
        phase = 2;
      } else if (phase == 2) {
        phase = 3;
      } else {
        phase = 0;
      }
      p = nl ? nl + 1 : end;
    }
  }

  if (records) st.offsets.push_back(static_cast<int64_t>(st.seq.size()));
  return records;
}

int64_t ms_fasta_seq_len() { return g_fasta_state ? static_cast<int64_t>(g_fasta_state->seq.size()) : 0; }
int64_t ms_fasta_names_len() { return g_fasta_state ? static_cast<int64_t>(g_fasta_state->names.size()) : 0; }

void ms_fasta_copy(uint8_t *seq_out, int64_t *offsets_out, char *names_out) {
  if (!g_fasta_state) return;
  auto &st = *g_fasta_state;
  memcpy(seq_out, st.seq.data(), st.seq.size());
  memcpy(offsets_out, st.offsets.data(), st.offsets.size() * sizeof(int64_t));
  memcpy(names_out, st.names.data(), st.names.size());
}

void ms_fasta_free() {
  delete g_fasta_state;
  g_fasta_state = nullptr;
}

}  // extern "C"
