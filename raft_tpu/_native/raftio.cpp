// raft_tpu native host I/O: streaming gz FASTA/FASTQ + PAF parsing and
// output emission.
//
// TPU-native equivalent of the reference's native I/O layer (kseq.h /
// paf.hpp / the ofstream emit loops in chop.hpp:318 and repeat.hpp:105) —
// re-implemented from scratch as a columnar parser: instead of per-record
// heap objects it produces contiguous blobs + int64 offsets and int32
// overlap columns that numpy wraps zero-copy. Parsing semantics match the
// reference exactly (first-whitespace-token names, CRLF stripping, FASTQ
// quality skipped by length, >=10-column PAF rows, first-seen-order name
// interning, record-0-mirror symmetric detection).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <regex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// Buffered line reader over gzFile (transparently handles plain files too).
// ---------------------------------------------------------------------------
class LineReader {
 public:
  explicit LineReader(const char* path)
      : fp_(gzopen(path, "rb")), buf_(1 << 22), pos_(0), end_(0), eof_(false) {
    if (fp_) gzbuffer(fp_, 1 << 20);
  }
  ~LineReader() {
    if (fp_) gzclose(fp_);
  }
  bool ok() const { return fp_ != nullptr; }

  // Returns a view of the next line (without trailing \n or \r\n); false at
  // EOF. The view stays valid until the next call.
  bool next(const char** s, size_t* n) {
    if (done_) return false;
    carry_.clear();
    for (;;) {
      if (pos_ < end_) {
        char* nl = static_cast<char*>(
            memchr(buf_.data() + pos_, '\n', end_ - pos_));
        if (nl) {
          size_t len = nl - (buf_.data() + pos_);
          if (carry_.empty()) {
            *s = buf_.data() + pos_;
            *n = strip_cr(*s, len);
          } else {
            carry_.append(buf_.data() + pos_, len);
            *s = carry_.data();
            *n = strip_cr(*s, carry_.size());
          }
          pos_ += len + 1;
          return true;
        }
        carry_.append(buf_.data() + pos_, end_ - pos_);
        pos_ = end_;
      }
      int r = gzread(fp_, buf_.data(), static_cast<unsigned>(buf_.size()));
      if (r <= 0) {
        done_ = true;  // final line without trailing newline
        if (carry_.empty()) return false;
        *s = carry_.data();
        *n = strip_cr(*s, carry_.size());
        return true;
      }
      pos_ = 0;
      end_ = static_cast<size_t>(r);
    }
  }

 private:
  static size_t strip_cr(const char* s, size_t n) {
    return (n && s[n - 1] == '\r') ? n - 1 : n;
  }
  gzFile fp_;
  std::vector<char> buf_;
  size_t pos_, end_;
  bool eof_;
  bool done_ = false;
  std::string carry_;
};

struct Interner {
  std::unordered_map<std::string, int32_t> map;
  int32_t intern(const char* s, size_t n) {
    auto it = map.find(std::string(s, n));
    if (it != map.end()) return it->second;
    int32_t id = static_cast<int32_t>(map.size());
    map.emplace(std::string(s, n), id);
    return id;
  }
  // read-only (thread-safe) lookup; -1 if unknown
  int32_t lookup(const char* s, size_t n) const {
    auto it = map.find(std::string(s, n));
    return it == map.end() ? -1 : it->second;
  }
};

// Read-only file mapping for the multi-threaded plain-file parsers.
struct Mapped {
  const char* p = nullptr;
  size_t n = 0;
  int fd = -1;
  bool ok() const { return p != nullptr; }
  ~Mapped() {
    if (p) munmap(const_cast<char*>(p), n);
    if (fd >= 0) close(fd);
  }
};

bool map_file(const char* path, Mapped* m) {
  m->fd = open(path, O_RDONLY);
  if (m->fd < 0) return false;
  struct stat st;
  if (fstat(m->fd, &st) != 0 || st.st_size == 0) return false;
  m->n = static_cast<size_t>(st.st_size);
  void* p = mmap(nullptr, m->n, PROT_READ, MAP_PRIVATE, m->fd, 0);
  if (p == MAP_FAILED) {
    m->n = 0;
    return false;
  }
  madvise(p, m->n, MADV_SEQUENTIAL);
  m->p = static_cast<const char*>(p);
  return true;
}

size_t mt_threshold() {
  const char* env = getenv("RAFT_IO_MT_THRESHOLD");
  if (env && *env) return static_cast<size_t>(strtoull(env, nullptr, 10));
  return 1u << 22;
}

int n_parse_threads() {
  const char* env = getenv("RAFT_IO_THREADS");
  if (env && *env) {
    int v = atoi(env);
    if (v >= 1) return v;
  }
  unsigned hc = std::thread::hardware_concurrency();
  if (hc == 0) hc = 4;
  return static_cast<int>(hc > 16 ? 16 : hc);
}

inline size_t line_len(const char* s, size_t n) {  // without \r
  return (n && s[n - 1] == '\r') ? n - 1 : n;
}

}  // namespace

// ---------------------------------------------------------------------------
// FASTA/FASTQ store
// ---------------------------------------------------------------------------
struct RaftFasta {
  std::vector<char> name_blob;   // names joined by '\0'
  std::vector<int64_t> name_off; // n+1
  std::vector<char> seq_blob;
  std::vector<int64_t> seq_off;  // n+1
  std::vector<int64_t> rec_off;  // n+1 record BYTE offsets (index mode)
  int real_reads = 1;
  Interner interner;
  int64_t n = 0;
};

namespace {

// ---------------------------------------------------------------------------
// Multi-threaded plain-FASTA parse (mmap + record-aligned byte regions).
// gz / FASTQ inputs use the streaming single-thread path below.
// ---------------------------------------------------------------------------
struct FaSizes {
  int64_t n_records = 0;
  int64_t name_bytes = 0;  // incl. one NUL per name
  int64_t seq_bytes = 0;
};

size_t fasta_region_start(const char* p, size_t n, size_t lo) {
  if (lo == 0) return (n && p[0] == '>') ? 0 : fasta_region_start(p, n, 1);
  const char* q = p + lo - 1;
  const char* end = p + n;
  while (q < end) {
    q = static_cast<const char*>(memchr(q, '\n', end - q));
    if (!q) return n;
    if (q + 1 < end && q[1] == '>') return static_cast<size_t>(q + 1 - p);
    q++;
  }
  return n;
}

// Pass 1: exact output sizes for a region (no allocation, pure scan).
void size_fasta_region(const char* p, size_t n, size_t lo, size_t hi,
                       FaSizes* out) {
  size_t i = fasta_region_start(p, n, lo);
  while (i < hi && i < n) {
    const char* line = p + i;
    const char* nl = static_cast<const char*>(memchr(line, '\n', n - i));
    size_t llen = nl ? static_cast<size_t>(nl - line) : n - i;
    size_t hlen = line_len(line, llen);
    size_t b = 1;
    while (b < hlen && isspace(static_cast<unsigned char>(line[b]))) b++;
    size_t e = b;
    while (e < hlen && !isspace(static_cast<unsigned char>(line[e]))) e++;
    out->n_records++;
    out->name_bytes += static_cast<int64_t>(e - b) + 1;

    size_t j = nl ? static_cast<size_t>(nl - p) + 1 : n;
    while (j < n && p[j] != '>') {
      const char* l2 = p + j;
      const char* nl2 = static_cast<const char*>(memchr(l2, '\n', n - j));
      size_t l2len = nl2 ? static_cast<size_t>(nl2 - l2) : n - j;
      out->seq_bytes += static_cast<int64_t>(line_len(l2, l2len));
      j = nl2 ? static_cast<size_t>(nl2 - p) + 1 : n;
    }
    i = j;
  }
}

// Pass 2: write names/seqs/offsets DIRECTLY into the final arrays at this
// region's precomputed base offsets (no local buffers, no merge copies —
// each output page is touched exactly once).
void fill_fasta_region(const char* p, size_t n, size_t lo, size_t hi,
                       char* name_blob, int64_t name_base,
                       char* seq_blob, int64_t seq_base,
                       int64_t* name_off, int64_t* seq_off,
                       int64_t rec_base) {
  size_t i = fasta_region_start(p, n, lo);
  int64_t npos = name_base;
  int64_t spos = seq_base;
  int64_t rec = rec_base;
  while (i < hi && i < n) {
    const char* line = p + i;
    const char* nl = static_cast<const char*>(memchr(line, '\n', n - i));
    size_t llen = nl ? static_cast<size_t>(nl - line) : n - i;
    size_t hlen = line_len(line, llen);
    size_t b = 1;
    while (b < hlen && isspace(static_cast<unsigned char>(line[b]))) b++;
    size_t e = b;
    while (e < hlen && !isspace(static_cast<unsigned char>(line[e]))) e++;
    memcpy(name_blob + npos, line + b, e - b);
    npos += static_cast<int64_t>(e - b);
    name_blob[npos++] = '\0';

    size_t j = nl ? static_cast<size_t>(nl - p) + 1 : n;
    while (j < n && p[j] != '>') {
      const char* l2 = p + j;
      const char* nl2 = static_cast<const char*>(memchr(l2, '\n', n - j));
      size_t l2len = nl2 ? static_cast<size_t>(nl2 - l2) : n - j;
      size_t slen = line_len(l2, l2len);
      memcpy(seq_blob + spos, l2, slen);
      spos += static_cast<int64_t>(slen);
      j = nl2 ? static_cast<size_t>(nl2 - p) + 1 : n;
    }
    rec++;
    name_off[rec] = npos;
    seq_off[rec] = spos;
    i = j;
  }
}

void fill_index_region(const char* p, size_t n, size_t lo, size_t hi,
                       char* name_blob, int64_t name_base,
                       int64_t* name_off, int64_t* rec_off,
                       int64_t rec_base) {
  size_t i = fasta_region_start(p, n, lo);
  int64_t npos = name_base;
  int64_t rec = rec_base;
  while (i < hi && i < n) {
    rec_off[rec] = static_cast<int64_t>(i);
    const char* line = p + i;
    const char* nl = static_cast<const char*>(memchr(line, '\n', n - i));
    size_t llen = nl ? static_cast<size_t>(nl - line) : n - i;
    size_t hlen = line_len(line, llen);
    size_t b = 1;
    while (b < hlen && isspace(static_cast<unsigned char>(line[b]))) b++;
    size_t e = b;
    while (e < hlen && !isspace(static_cast<unsigned char>(line[e]))) e++;
    memcpy(name_blob + npos, line + b, e - b);
    npos += static_cast<int64_t>(e - b);
    name_blob[npos++] = '\0';
    size_t j = nl ? static_cast<size_t>(nl - p) + 1 : n;
    while (j < n && p[j] != '>') {
      const char* nl2 =
          static_cast<const char*>(memchr(p + j, '\n', n - j));
      j = nl2 ? static_cast<size_t>(nl2 - p) + 1 : n;
    }
    rec++;
    name_off[rec] = npos;
    i = j;
  }
}

RaftFasta* load_fasta_threaded_range(const char* p, size_t n,
                                     size_t range_lo, size_t range_hi);

RaftFasta* load_fasta_threaded(const Mapped& m) {
  return load_fasta_threaded_range(m.p, m.n, 0, m.n);
}

// Name + byte-offset index over the whole file (no sequence copies):
// the cheap first pass of the streaming (beyond-RAM) pipeline mode.
RaftFasta* index_fasta_threaded(const Mapped& m) {
  const int T = n_parse_threads();
  const char* p = m.p;
  const size_t n = m.n;
  std::vector<FaSizes> sizes(T);
  {
    std::vector<std::thread> threads;
    for (int t = 0; t < T; t++) {
      threads.emplace_back(size_fasta_region, p, n, n * t / T,
                           n * (t + 1) / T, &sizes[t]);
    }
    for (auto& th : threads) th.join();
  }
  std::vector<int64_t> rec_base(T + 1, 0), nb_base(T + 1, 0);
  for (int t = 0; t < T; t++) {
    rec_base[t + 1] = rec_base[t] + sizes[t].n_records;
    nb_base[t + 1] = nb_base[t] + sizes[t].name_bytes;
  }
  auto* fa = new RaftFasta();
  fa->name_blob.resize(nb_base[T]);
  fa->name_off.resize(rec_base[T] + 1);
  fa->rec_off.resize(rec_base[T] + 1);
  fa->name_off[0] = 0;
  fa->rec_off[rec_base[T]] = static_cast<int64_t>(n);
  {
    std::vector<std::thread> threads;
    for (int t = 0; t < T; t++) {
      threads.emplace_back(fill_index_region, p, n, n * t / T,
                           n * (t + 1) / T, fa->name_blob.data(),
                           nb_base[t], fa->name_off.data(),
                           fa->rec_off.data(), rec_base[t]);
    }
    for (auto& th : threads) th.join();
  }
  fa->n = rec_base[T];
  static const std::regex sim_re(
      "^read=[0-9]+,[a-z]+,position=[0-9]+-[0-9]+,length=[0-9]+,(.*)");
  for (int64_t i = 0; i < fa->n; i++) {
    const char* nm = fa->name_blob.data() + fa->name_off[i];
    size_t nl = static_cast<size_t>(fa->name_off[i + 1] - fa->name_off[i] - 1);
    if (i == 0 && std::regex_match(std::string(nm, nl), sim_re))
      fa->real_reads = 0;
    fa->interner.intern(nm, nl);
  }
  return fa;
}

// Parse only the records starting in [range_lo, range_hi) — the byte-range
// primitive behind the streaming (beyond-RAM) pipeline mode.
RaftFasta* load_fasta_threaded_range(const char* p, size_t n,
                                     size_t range_lo, size_t range_hi) {
  const int T = n_parse_threads();

  const size_t span = range_hi - range_lo;
  auto seg = [&](int t) { return range_lo + span * t / T; };

  // pass 1: size every region (parallel scan, no allocation)
  std::vector<FaSizes> sizes(T);
  {
    std::vector<std::thread> threads;
    for (int t = 0; t < T; t++) {
      threads.emplace_back(size_fasta_region, p, n, seg(t), seg(t + 1),
                           &sizes[t]);
    }
    for (auto& th : threads) th.join();
  }
  int64_t total_names = 0, total_name_bytes = 0, total_seq = 0;
  std::vector<int64_t> rec_base(T + 1, 0), nb_base(T + 1, 0),
      sb_base(T + 1, 0);
  for (int t = 0; t < T; t++) {
    rec_base[t + 1] = rec_base[t] + sizes[t].n_records;
    nb_base[t + 1] = nb_base[t] + sizes[t].name_bytes;
    sb_base[t + 1] = sb_base[t] + sizes[t].seq_bytes;
  }
  total_names = rec_base[T];
  total_name_bytes = nb_base[T];
  total_seq = sb_base[T];

  // pass 2: exact-size allocations written once, in parallel, in place
  auto* fa = new RaftFasta();
  fa->name_blob.resize(total_name_bytes);
  fa->seq_blob.resize(total_seq);
  fa->name_off.resize(total_names + 1);
  fa->seq_off.resize(total_names + 1);
  fa->name_off[0] = 0;
  fa->seq_off[0] = 0;
  {
    std::vector<std::thread> threads;
    for (int t = 0; t < T; t++) {
      threads.emplace_back(fill_fasta_region, p, n, seg(t), seg(t + 1),
                           fa->name_blob.data(), nb_base[t],
                           fa->seq_blob.data(), sb_base[t],
                           fa->name_off.data(), fa->seq_off.data(),
                           rec_base[t]);
    }
    for (auto& th : threads) th.join();
  }
  fa->n = total_names;

  // global first-seen-order interning + the record-0 simulated gate
  for (int64_t i = 0; i < fa->n; i++) {
    const char* nm = fa->name_blob.data() + fa->name_off[i];
    size_t nl = static_cast<size_t>(
        fa->name_off[i + 1] - fa->name_off[i] - 1);
    if (i == 0) {
      static const std::regex sim_re(
          "^read=[0-9]+,[a-z]+,position=[0-9]+-[0-9]+,length=[0-9]+,(.*)");
      if (std::regex_match(std::string(nm, nl), sim_re)) fa->real_reads = 0;
    }
    fa->interner.intern(nm, nl);
  }
  return fa;
}

}  // namespace

extern "C" {

RaftFasta* raftio_load_fasta(const char* path) {
  {
    Mapped m;
    if (map_file(path, &m) && m.n > mt_threshold() && m.p[0] == '>') {
      RaftFasta* fa = load_fasta_threaded(m);
      if (fa) return fa;
    }
  }
  LineReader rd(path);
  if (!rd.ok()) return nullptr;
  auto* fa = new RaftFasta();
  fa->name_off.push_back(0);
  fa->seq_off.push_back(0);

  static const std::regex sim_re(
      "^read=[0-9]+,[a-z]+,position=[0-9]+-[0-9]+,length=[0-9]+,(.*)");

  bool have_rec = false;
  bool in_fastq = false;
  bool skipping_qual = false;
  int64_t seq_len_cur = 0;
  int64_t qual_len = 0;
  std::string cur_name;

  auto flush = [&]() {
    if (!have_rec) return;
    if (fa->n == 0) {
      if (std::regex_match(cur_name, sim_re)) fa->real_reads = 0;
    }
    fa->interner.intern(cur_name.data(), cur_name.size());
    fa->name_blob.insert(fa->name_blob.end(), cur_name.begin(),
                         cur_name.end());
    fa->name_blob.push_back('\0');
    fa->name_off.push_back(static_cast<int64_t>(fa->name_blob.size()));
    fa->seq_off.push_back(static_cast<int64_t>(fa->seq_blob.size()));
    fa->n++;
    have_rec = false;
  };

  const char* s;
  size_t len;
  while (rd.next(&s, &len)) {
    if (skipping_qual) {
      qual_len += static_cast<int64_t>(len);
      if (qual_len >= seq_len_cur) skipping_qual = false;
      continue;
    }
    if (len && (s[0] == '>' || s[0] == '@')) {
      flush();
      // name = first whitespace-delimited token after the marker
      size_t b = 1;
      while (b < len && isspace(static_cast<unsigned char>(s[b]))) b++;
      size_t e = b;
      while (e < len && !isspace(static_cast<unsigned char>(s[e]))) e++;
      cur_name.assign(s + b, e - b);
      have_rec = true;
      in_fastq = (s[0] == '@');
    } else if (len && s[0] == '+' && in_fastq) {
      seq_len_cur = static_cast<int64_t>(fa->seq_blob.size()) -
                    fa->seq_off.back();
      qual_len = 0;
      if (seq_len_cur > 0) {
        skipping_qual = true;
      } else {
        flush();
      }
    } else if (len) {
      if (have_rec)
        fa->seq_blob.insert(fa->seq_blob.end(), s, s + len);
    }
  }
  flush();
  return fa;
}

RaftFasta* raftio_index_fasta(const char* path) {
  Mapped m;
  if (!map_file(path, &m)) return nullptr;
  if (!m.n || m.p[0] != '>') return nullptr;  // plain FASTA only
  return index_fasta_threaded(m);
}

RaftFasta* raftio_load_fasta_range(const char* path, int64_t lo,
                                   int64_t hi) {
  Mapped m;
  if (!map_file(path, &m)) return nullptr;
  if (static_cast<size_t>(hi) > m.n || lo < 0 || lo >= hi) return nullptr;
  return load_fasta_threaded_range(m.p, m.n, static_cast<size_t>(lo),
                                   static_cast<size_t>(hi));
}

const int64_t* rf_rec_off(RaftFasta* fa) { return fa->rec_off.data(); }

void raftio_free_fasta(RaftFasta* fa) { delete fa; }
int64_t rf_n_reads(RaftFasta* fa) { return fa->n; }
int rf_real_reads(RaftFasta* fa) { return fa->real_reads; }
const char* rf_name_blob(RaftFasta* fa) { return fa->name_blob.data(); }
int64_t rf_name_blob_size(RaftFasta* fa) {
  return static_cast<int64_t>(fa->name_blob.size());
}
const char* rf_seq_blob(RaftFasta* fa) { return fa->seq_blob.data(); }
const int64_t* rf_seq_off(RaftFasta* fa) { return fa->seq_off.data(); }

// ---------------------------------------------------------------------------
// PAF
// ---------------------------------------------------------------------------
struct RaftPaf {
  std::vector<int32_t> a_id, b_id, a_s, a_e, b_s, b_e;
  int symmetric = 0;
  int64_t n_names = 0;
};

namespace {

struct PafRow {
  int32_t a, b, as_, ae, bs, be;
  bool valid;
};

inline PafRow parse_paf_line(const char* s, size_t len, const Interner& in) {
  PafRow r{0, 0, 0, 0, 0, 0, false};
  const char* col[10];
  size_t clen[10];
  int nc = 0;
  const char* p = s;
  const char* endp = s + len;
  while (nc < 10) {
    const char* t = static_cast<const char*>(memchr(p, '\t', endp - p));
    col[nc] = p;
    clen[nc] = (t ? t : endp) - p;
    nc++;
    if (!t) break;
    p = t + 1;
  }
  if (nc < 10) return r;  // also requires a 10th column present
  auto toi = [](const char* q, size_t n) -> int64_t {
    int64_t v = 0;
    size_t i = 0;
    bool neg = false;
    if (i < n && (q[i] == '-' || q[i] == '+')) neg = (q[i++] == '-');
    for (; i < n && q[i] >= '0' && q[i] <= '9'; i++)
      v = v * 10 + (q[i] - '0');
    return neg ? -v : v;
  };
  r.as_ = static_cast<int32_t>(toi(col[2], clen[2]));
  r.ae = static_cast<int32_t>(toi(col[3], clen[3]));
  r.bs = static_cast<int32_t>(toi(col[7], clen[7]));
  r.be = static_cast<int32_t>(toi(col[8], clen[8]));
  r.a = in.lookup(col[0], clen[0]);
  r.b = in.lookup(col[5], clen[5]);
  r.valid = true;
  return r;
}

struct PafLocal {
  std::vector<int32_t> a_id, b_id, a_s, a_e, b_s, b_e;
  bool mirror = false;
  int64_t unknown = 0;
};

void parse_paf_region(const char* p, size_t n, size_t lo, size_t hi,
                      const Interner* in, PafRow row0, size_t row0_off,
                      PafLocal* out) {
  size_t i = lo;
  if (lo != 0) {
    const char* q = static_cast<const char*>(memchr(p + lo - 1, '\n',
                                                    n - (lo - 1)));
    if (!q) return;
    i = static_cast<size_t>(q - p) + 1;
  }
  while (i < hi && i < n) {
    size_t line_off = i;
    const char* line = p + i;
    const char* nl = static_cast<const char*>(memchr(line, '\n', n - i));
    size_t llen = nl ? static_cast<size_t>(nl - line) : n - i;
    size_t len = line_len(line, llen);
    i = nl ? static_cast<size_t>(nl - p) + 1 : n;
    PafRow r = parse_paf_line(line, len, *in);
    if (!r.valid) continue;
    if (r.a < 0 || r.b < 0) out->unknown++;
    bool is_row0 = line_off == row0_off;
    if (!is_row0 && r.a >= 0 && r.b >= 0 &&
        row0.a == r.b && row0.b == r.a && row0.as_ == r.bs &&
        row0.ae == r.be && row0.bs == r.as_ && row0.be == r.ae)
      out->mirror = true;
    out->a_id.push_back(r.a);
    out->b_id.push_back(r.b);
    out->a_s.push_back(r.as_);
    out->a_e.push_back(r.ae);
    out->b_s.push_back(r.bs);
    out->b_e.push_back(r.be);
  }
}

RaftPaf* load_paf_threaded(const Mapped& m, RaftFasta* fa) {
  const char* p = m.p;
  const size_t n = m.n;
  // row 0 = first valid (>=10 col) row, needed by every thread's mirror
  // test; identified by byte offset so no thread ever compares it to
  // itself (the reference skips exactly record 0, chop.hpp:171-184)
  PafRow row0{0, 0, 0, 0, 0, 0, false};
  size_t row0_off = 0;
  {
    size_t i = 0;
    while (i < n && !row0.valid) {
      row0_off = i;
      const char* line = p + i;
      const char* nl = static_cast<const char*>(memchr(line, '\n', n - i));
      size_t llen = nl ? static_cast<size_t>(nl - line) : n - i;
      row0 = parse_paf_line(line, line_len(line, llen), fa->interner);
      i = nl ? static_cast<size_t>(nl - p) + 1 : n;
    }
    if (!row0.valid || row0.a < 0 || row0.b < 0)
      return nullptr;  // unknown names in row 0 → streaming path interns
  }

  const int T = n_parse_threads();
  std::vector<PafLocal> locals(T);
  std::vector<std::thread> threads;
  for (int t = 0; t < T; t++) {
    size_t lo = n * t / T;
    size_t hi = n * (t + 1) / T;
    threads.emplace_back(parse_paf_region, p, n, lo, hi, &fa->interner,
                         row0, row0_off, &locals[t]);
  }
  for (auto& th : threads) th.join();

  int64_t unknown = 0;
  size_t total = 0;
  bool mirror = false;
  for (auto& L : locals) {
    unknown += L.unknown;
    total += L.a_id.size();
    mirror |= L.mirror;
  }
  if (unknown) return nullptr;  // fall back: streaming path interns them

  auto* pf = new RaftPaf();
  auto fill = [&](std::vector<int32_t> RaftPaf::*col,
                  std::vector<int32_t> PafLocal::*lcol) {
    (pf->*col).resize(total);
    size_t off = 0;
    for (auto& L : locals) {
      if (!(L.*lcol).empty())
        memcpy((pf->*col).data() + off, (L.*lcol).data(),
               (L.*lcol).size() * sizeof(int32_t));
      off += (L.*lcol).size();
    }
  };
  fill(&RaftPaf::a_id, &PafLocal::a_id);
  fill(&RaftPaf::b_id, &PafLocal::b_id);
  fill(&RaftPaf::a_s, &PafLocal::a_s);
  fill(&RaftPaf::a_e, &PafLocal::a_e);
  fill(&RaftPaf::b_s, &PafLocal::b_s);
  fill(&RaftPaf::b_e, &PafLocal::b_e);
  pf->symmetric = mirror ? 1 : 0;
  pf->n_names = static_cast<int64_t>(fa->interner.map.size());
  return pf;
}

}  // namespace

RaftPaf* raftio_load_paf(const char* path, RaftFasta* fa) {
  {
    Mapped m;
    if (map_file(path, &m) && m.n > mt_threshold()) {
      RaftPaf* pf = load_paf_threaded(m, fa);
      if (pf) return pf;
    }
  }
  LineReader rd(path);
  if (!rd.ok()) return nullptr;
  auto* pf = new RaftPaf();
  Interner& in = fa->interner;

  bool have_first = false;
  int32_t f_a = 0, f_b = 0, f_as = 0, f_ae = 0, f_bs = 0, f_be = 0;
  bool check_sym = true;
  bool symmetric = false;

  const char* s;
  size_t len;
  const char* col[16];
  size_t clen[16];
  while (rd.next(&s, &len)) {
    // split on tabs, need at least 10 columns (paf.hpp:84-86)
    int nc = 0;
    const char* p = s;
    const char* endp = s + len;
    while (nc < 16) {
      const char* t = static_cast<const char*>(memchr(p, '\t', endp - p));
      col[nc] = p;
      clen[nc] = (t ? t : endp) - p;
      nc++;
      if (!t) break;
      p = t + 1;
    }
    if (nc < 10) continue;

    auto toi = [](const char* q, size_t n) -> int64_t {
      int64_t v = 0;
      size_t i = 0;
      bool neg = false;
      if (i < n && (q[i] == '-' || q[i] == '+')) neg = (q[i++] == '-');
      for (; i < n && q[i] >= '0' && q[i] <= '9'; i++) v = v * 10 + (q[i] - '0');
      return neg ? -v : v;
    };

    int32_t qs = static_cast<int32_t>(toi(col[2], clen[2]));
    int32_t qe = static_cast<int32_t>(toi(col[3], clen[3]));
    int32_t ts = static_cast<int32_t>(toi(col[7], clen[7]));
    int32_t te = static_cast<int32_t>(toi(col[8], clen[8]));
    int32_t ai = in.intern(col[0], clen[0]);
    int32_t bi = in.intern(col[5], clen[5]);

    if (!have_first) {
      have_first = true;
      f_a = ai; f_b = bi; f_as = qs; f_ae = qe; f_bs = ts; f_be = te;
    } else if (check_sym && !symmetric) {
      if (f_a == bi && f_b == ai && f_as == ts && f_ae == te &&
          f_bs == qs && f_be == qe) {
        symmetric = true;
        check_sym = false;
      }
    }
    pf->a_id.push_back(ai);
    pf->b_id.push_back(bi);
    pf->a_s.push_back(qs);
    pf->a_e.push_back(qe);
    pf->b_s.push_back(ts);
    pf->b_e.push_back(te);
  }
  pf->symmetric = symmetric ? 1 : 0;
  pf->n_names = static_cast<int64_t>(in.map.size());
  return pf;
}

void raftio_free_paf(RaftPaf* pf) { delete pf; }
int64_t rp_n_rows(RaftPaf* pf) { return static_cast<int64_t>(pf->a_id.size()); }
int rp_symmetric(RaftPaf* pf) { return pf->symmetric; }
int64_t rp_n_names(RaftPaf* pf) { return pf->n_names; }
const int32_t* rp_a_id(RaftPaf* pf) { return pf->a_id.data(); }
const int32_t* rp_b_id(RaftPaf* pf) { return pf->b_id.data(); }
const int32_t* rp_a_s(RaftPaf* pf) { return pf->a_s.data(); }
const int32_t* rp_a_e(RaftPaf* pf) { return pf->a_e.data(); }
const int32_t* rp_b_s(RaftPaf* pf) { return pf->b_s.data(); }
const int32_t* rp_b_e(RaftPaf* pf) { return pf->b_e.data(); }

// ---------------------------------------------------------------------------
// Emitters
// ---------------------------------------------------------------------------

namespace {
class BufWriter {
 public:
  explicit BufWriter(const char* path, bool append = false)
      : f_(fopen(path, append ? "ab" : "wb")), buf_(1 << 22), n_(0) {}
  ~BufWriter() {
    flush();
    if (f_) fclose(f_);
  }
  bool ok() const { return f_ != nullptr; }
  inline void put(const char* s, size_t n) {
    if (n_ + n > buf_.size()) {
      flush();
      if (n > buf_.size()) {
        fwrite(s, 1, n, f_);
        return;
      }
    }
    memcpy(buf_.data() + n_, s, n);
    n_ += n;
  }
  inline void putc(char c) {
    if (n_ + 1 > buf_.size()) flush();
    buf_[n_++] = c;
  }
  inline void putint(int64_t v) {
    char tmp[24];
    int k = 0;
    if (v < 0) {
      putc('-');
      v = -v;
    }
    do {
      tmp[k++] = static_cast<char>('0' + (v % 10));
      v /= 10;
    } while (v);
    if (n_ + static_cast<size_t>(k) > buf_.size()) flush();
    while (k) buf_[n_++] = tmp[--k];
  }
  void flush() {
    if (n_) {
      fwrite(buf_.data(), 1, n_, f_);
      n_ = 0;
    }
  }

 private:
  FILE* f_;
  std::vector<char> buf_;
  size_t n_;
};
}  // namespace

// Fragment FASTA: headers are pre-rendered by the caller (hdr_blob with
// hdr_off offsets, one per fragment; empty header → no header line, which
// mirrors the reference's headerless simulated-mode fallthrough).
int raftio_emit_frags(const char* path, const char* seq_blob,
                      const int64_t* seq_off, const int32_t* frag_read,
                      const int64_t* char_start, const int64_t* char_len,
                      int64_t n_frags, const char* hdr_blob,
                      const int64_t* hdr_off) {
  BufWriter w(path);
  if (!w.ok()) return -1;
  for (int64_t i = 0; i < n_frags; i++) {
    int64_t hn = hdr_off[i + 1] - hdr_off[i];
    if (hn > 0) {
      w.put(hdr_blob + hdr_off[i], static_cast<size_t>(hn));
      w.putc('\n');
    }
    int64_t base = seq_off[frag_read[i]] + char_start[i];
    w.put(seq_blob + base, static_cast<size_t>(char_len[i]));
    w.putc('\n');
  }
  return 0;
}

// Fragment FASTA with in-C++ header rendering (chop.hpp:250-321).
// All header fields derive from char_start/char_len (see
// raft_tpu/result.py); name/align/suffix text arrives as blobs with
// [n+1] offsets. name offsets include a trailing NUL per name
// (len = off[i+1]-off[i]-1); align/suffix offsets are exact.
int raftio_emit_frags_full(
    const char* path, const char* seq_blob, const int64_t* seq_off,
    int64_t n_frags, const int32_t* frag_read, const int64_t* char_start,
    const int64_t* char_len, const uint8_t* whole, int real_reads,
    const char* name_blob, const int64_t* name_off,
    const uint8_t* align_code, const int64_t* start_pos,
    const int64_t* end_pos, const char* align_blob,
    const int64_t* align_off, const char* suffix_blob,
    const int64_t* suffix_off, int64_t first_read_num, int append) {
  BufWriter w(path, append != 0);
  if (!w.ok()) return -1;
  for (int64_t j = 0; j < n_frags; j++) {
    int64_t i = frag_read[j];
    int64_t cs = char_start[j];
    int64_t cl = char_len[j];
    int64_t num = first_read_num + j;
    if (real_reads) {
      w.put(">read=", 6);
      w.putint(num);
      w.putc(',');
      w.put(name_blob + name_off[i],
            static_cast<size_t>(name_off[i + 1] - name_off[i] - 1));
      w.put(",pos_on_original_read=", 22);
      w.putint(cs);
      w.putc('-');
      w.putint(cs + cl);
      w.putc('\n');
    } else {
      uint8_t ac = align_code[i];
      bool wh = whole[j] != 0;
      if (wh || ac == 0 || ac == 1) {
        w.put(">read=", 6);
        w.putint(num);
        w.putc(',');
        w.put(align_blob + align_off[i],
              static_cast<size_t>(align_off[i + 1] - align_off[i]));
        w.put(",position=", 10);
        if (wh) {
          w.putint(start_pos[i]);
          w.putc('-');
          w.putint(end_pos[i]);
        } else if (ac == 0) {  // forward
          w.putint(start_pos[i] + cs);
          w.putc('-');
          w.putint(start_pos[i] + cs + cl);
        } else {  // reverse
          w.putint(end_pos[i] - cs - cl);
          w.putc('-');
          w.putint(end_pos[i] - cs);
        }
        w.put(",length=", 8);
        w.putint(cl);
        w.put(suffix_blob + suffix_off[i],
              static_cast<size_t>(suffix_off[i + 1] - suffix_off[i]));
        w.putc('\n');
      }
    }
    w.put(seq_blob + seq_off[i] + cs, static_cast<size_t>(cl));
    w.putc('\n');
  }
  return 0;
}

// coverage.txt: "read {i} " + "{w*reso},{cov} " per window + "\n"
// cov values for read i are cov[cov_off[i] .. cov_off[i+1])
int raftio_emit_coverage(const char* path, const int32_t* cov,
                         const int64_t* cov_off, int64_t n_reads,
                         int32_t reso, int64_t first_read_index,
                         int append) {
  BufWriter w(path, append != 0);
  if (!w.ok()) return -1;
  for (int64_t i = 0; i < n_reads; i++) {
    w.put("read ", 5);
    w.putint(first_read_index + i);
    w.putc(' ');
    int64_t wstart = 0;
    for (int64_t j = cov_off[i]; j < cov_off[i + 1]; j++) {
      w.putint(wstart);
      w.putc(',');
      w.putint(cov[j]);
      w.putc(' ');
      wstart += reso;
    }
    w.putc('\n');
  }
  return 0;
}

// long_repeats.txt: "read {i}, " + "{s},{e}    " per interval + "\n"
int raftio_emit_repeats(const char* path, const int32_t* rep_s,
                        const int32_t* rep_e, const int64_t* rep_off,
                        int64_t n_reads, int64_t first_read_index,
                        int append) {
  BufWriter w(path, append != 0);
  if (!w.ok()) return -1;
  for (int64_t i = 0; i < n_reads; i++) {
    w.put("read ", 5);
    w.putint(first_read_index + i);
    w.put(", ", 2);
    for (int64_t j = rep_off[i]; j < rep_off[i + 1]; j++) {
      w.putint(rep_s[j]);
      w.putc(',');
      w.putint(rep_e[j]);
      w.put("    ", 4);
    }
    w.putc('\n');
  }
  return 0;
}

}  // extern "C"
