// Native FASTA/FASTQ reader + alphabet encoder for host ingest.
//
// Role: the reference keeps sequence parsing native (kseq + a salmon-derived
// multithreaded feeder, /root/reference/src/fqfeeder.cpp, d2.h:273-305)
// because host ingest must outpace the device. This is a from-scratch
// streaming parser with the same job: read records from (possibly
// gzip-compressed) FASTA/FASTQ and hand back alphabet-encoded byte arrays
// ready for device packing. Exposed through a C ABI consumed via ctypes
// (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -shared -fPIC fastx_reader.cpp -o libfastx.so -lz

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

namespace {

constexpr size_t CHUNK = 1 << 20;

struct Reader {
    gzFile fp = nullptr;
    // input buffer
    unsigned char *buf = nullptr;
    size_t buf_len = 0, buf_pos = 0;
    bool eof = false;
    // record storage (reused)
    char *name = nullptr;
    size_t name_cap = 0;
    unsigned char *seq = nullptr;
    size_t seq_cap = 0, seq_len = 0;
    int fastq = -1;  // -1 unknown, 0 fasta, 1 fastq
    unsigned char lut[256];

    bool fill() {
        if (eof) return buf_pos < buf_len;
        if (buf_pos < buf_len) return true;
        int n = gzread(fp, buf, CHUNK);
        if (n <= 0) { eof = true; return false; }
        buf_len = size_t(n);
        buf_pos = 0;
        return true;
    }
    int peek() {
        if (!fill()) return -1;
        return buf[buf_pos];
    }
    int getc_() {
        if (!fill()) return -1;
        return buf[buf_pos++];
    }
    // append line (up to '\n', not included) through lut into seq
    bool read_seq_line() {
        for (;;) {
            if (!fill()) return false;
            unsigned char *nl = (unsigned char *)memchr(
                buf + buf_pos, '\n', buf_len - buf_pos);
            size_t end = nl ? size_t(nl - buf) : buf_len;
            size_t n = end - buf_pos;
            if (seq_len + n + 1 > seq_cap) {
                seq_cap = (seq_len + n + 1) * 2;
                seq = (unsigned char *)realloc(seq, seq_cap);
            }
            for (size_t i = 0; i < n; ++i)
                seq[seq_len + i] = lut[buf[buf_pos + i]];
            seq_len += n;
            buf_pos = end;
            if (nl) { ++buf_pos; return true; }
            if (eof) return true;
        }
    }
    bool skip_line() {
        for (;;) {
            if (!fill()) return false;
            unsigned char *nl = (unsigned char *)memchr(
                buf + buf_pos, '\n', buf_len - buf_pos);
            if (nl) { buf_pos = size_t(nl - buf) + 1; return true; }
            buf_pos = buf_len;
            if (eof) return false;
        }
    }
    bool read_name_line() {
        size_t len = 0;
        for (;;) {
            if (!fill()) { if (len) break; return false; }
            unsigned char *nl = (unsigned char *)memchr(
                buf + buf_pos, '\n', buf_len - buf_pos);
            size_t end = nl ? size_t(nl - buf) : buf_len;
            size_t n = end - buf_pos;
            if (len + n + 1 > name_cap) {
                name_cap = (len + n + 1) * 2;
                name = (char *)realloc(name, name_cap);
            }
            memcpy(name + len, buf + buf_pos, n);
            len += n;
            buf_pos = end;
            if (nl) { ++buf_pos; break; }
            if (eof) break;
        }
        name[len] = 0;
        // trim at first whitespace
        for (size_t i = 0; i < len; ++i) {
            if (name[i] == ' ' || name[i] == '\t' || name[i] == '\r') {
                name[i] = 0;
                break;
            }
        }
        return true;
    }
};

}  // namespace

extern "C" {

void *fxr_open(const char *path, const unsigned char *lut256) {
    gzFile fp = gzopen(path, "rb");
    if (!fp) return nullptr;
    gzbuffer(fp, 1 << 20);
    Reader *r = new Reader();
    r->fp = fp;
    r->buf = (unsigned char *)malloc(CHUNK);
    memcpy(r->lut, lut256, 256);
    return r;
}

// Returns sequence length (>= 0) and sets *name/*seq (valid until next
// call), or -1 at end of input / -2 on malformed input.
long fxr_next(void *h, const char **name_out,
              const unsigned char **seq_out) {
    Reader *r = (Reader *)h;
    int c = r->getc_();
    while (c == '\n' || c == '\r') c = r->getc_();
    if (c < 0) return -1;
    if (r->fastq == -1) r->fastq = (c == '@');
    if (c != '>' && c != '@') return -2;
    if (!r->read_name_line()) return -1;
    r->seq_len = 0;
    if (r->fastq) {
        if (!r->read_seq_line()) return -2;
        // '+' line then quality line (same byte length as seq)
        if (r->peek() == '+') {
            r->skip_line();
            size_t toskip = r->seq_len;
            while (toskip) {
                if (!r->fill()) break;
                size_t n = r->buf_len - r->buf_pos;
                if (n > toskip) n = toskip;
                r->buf_pos += n;
                toskip -= n;
            }
            r->skip_line();
        }
    } else {
        for (;;) {
            int p = r->peek();
            if (p < 0 || p == '>') break;
            if (!r->read_seq_line()) break;
        }
    }
    *name_out = r->name;
    *seq_out = r->seq;
    return long(r->seq_len);
}

void fxr_close(void *h) {
    Reader *r = (Reader *)h;
    if (r->fp) gzclose(r->fp);
    free(r->buf);
    free(r->name);
    free(r->seq);
    delete r;
}

}  // extern "C"
