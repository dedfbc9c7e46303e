// Native FASTA/FASTQ(.gz) record reader for longqc_tpu's host I/O.
//
// A buffered lexer in the spirit of the reference's kseq-based readers
// (written from scratch): zlib-transparent input, batch extraction into
// flat arenas (names/seqs/quals + offsets) consumed zero-copy-ish by
// the Python wrapper (io/native.py) via ctypes.
//
// C ABI:
//   void*  lqf_open(const char* path);
//   long   lqf_next_batch(void* h, long max_records, long max_bases);
//   const char* lqf_names(void* h);  const long* lqf_name_offs(void* h);
//   const char* lqf_seqs(void* h);   const long* lqf_seq_offs(void* h);
//   const char* lqf_quals(void* h);  // empty when FASTA
//   int    lqf_has_qual(void* h);
//   void   lqf_close(void* h);

#include <zlib.h>

#include <cctype>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  gzFile fp = nullptr;
  std::string buf;
  size_t pos = 0;
  bool eof = false;
  int peeked = -2;  // -2: none

  // batch arenas
  std::string names, seqs, quals;
  std::vector<long> name_offs, seq_offs;
  bool has_qual = false;

  int getc_() {
    if (peeked != -2) {
      int c = peeked;
      peeked = -2;
      return c;
    }
    if (pos >= buf.size()) {
      if (eof) return -1;
      char tmp[1 << 16];
      int n = gzread(fp, tmp, sizeof(tmp));
      if (n <= 0) {
        eof = true;
        return -1;
      }
      buf.assign(tmp, n);
      pos = 0;
    }
    return (unsigned char)buf[pos++];
  }

  void ungetc_(int c) { peeked = c; }

  // read until newline into out (newline consumed, not stored)
  bool getline_(std::string* out) {
    out->clear();
    int c = getc_();
    if (c < 0) return false;
    while (c >= 0 && c != '\n') {
      if (c != '\r') out->push_back((char)c);
      c = getc_();
    }
    return true;
  }
};

}  // namespace

extern "C" {

void* lqf_open(const char* path) {
  gzFile fp = gzopen(path, "rb");
  if (!fp) return nullptr;
  Reader* r = new Reader();
  r->fp = fp;
  return r;
}

void lqf_close(void* h) {
  Reader* r = (Reader*)h;
  if (!r) return;
  gzclose(r->fp);
  delete r;
}

// Returns number of records read (0 at EOF, -1 on parse error).
long lqf_next_batch(void* h, long max_records, long max_bases) {
  Reader* r = (Reader*)h;
  r->names.clear();
  r->seqs.clear();
  r->quals.clear();
  r->name_offs.assign(1, 0);
  r->seq_offs.assign(1, 0);
  r->has_qual = false;

  long n = 0;
  long bases = 0;
  std::string line;
  while (n < max_records && bases < max_bases) {
    int c = r->getc_();
    while (c == '\n' || c == '\r') c = r->getc_();
    if (c < 0) break;
    if (c != '>' && c != '@') return -1;
    bool fastq = (c == '@');
    if (!r->getline_(&line)) return -1;
    // name = first whitespace-delimited token
    size_t ws = line.find_first_of(" \t");
    r->names.append(line, 0, ws == std::string::npos ? line.size() : ws);
    r->name_offs.push_back((long)r->names.size());

    size_t seq_start = r->seqs.size();
    if (fastq) {
      if (!r->getline_(&line)) return -1;
      r->seqs += line;
      int p = r->getc_();  // '+' line
      if (p != '+') return -1;
      r->getline_(&line);
      size_t want = r->seqs.size() - seq_start;
      size_t qual_start = r->quals.size();
      // quality can wrap lines in pathological files; read exactly want
      while (r->quals.size() - qual_start < want) {
        if (!r->getline_(&line)) return -1;
        r->quals += line;
      }
      r->has_qual = true;
    } else {
      // multi-line FASTA: read until next '>' or EOF
      while (true) {
        int c2 = r->getc_();
        if (c2 < 0) break;
        if (c2 == '>') {
          r->ungetc_(c2);
          break;
        }
        if (c2 == '\n' || c2 == '\r') continue;
        r->seqs.push_back((char)c2);
        while (true) {
          int c3 = r->getc_();
          if (c3 < 0 || c3 == '\n') break;
          if (c3 != '\r') r->seqs.push_back((char)c3);
        }
      }
    }
    r->seq_offs.push_back((long)r->seqs.size());
    bases += (long)(r->seqs.size() - seq_start);
    ++n;
  }
  return n;
}

const char* lqf_names(void* h) { return ((Reader*)h)->names.c_str(); }
const long* lqf_name_offs(void* h) { return ((Reader*)h)->name_offs.data(); }
const char* lqf_seqs(void* h) { return ((Reader*)h)->seqs.c_str(); }
const long* lqf_seq_offs(void* h) { return ((Reader*)h)->seq_offs.data(); }
const char* lqf_quals(void* h) { return ((Reader*)h)->quals.c_str(); }
int lqf_has_qual(void* h) { return ((Reader*)h)->has_qual ? 1 : 0; }

}  // extern "C"
