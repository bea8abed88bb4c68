// Fast fixed-column HITRAN .par line-database parser.
//
// The reference's native data path is the 970 MB TAPE3 binary consumed by
// the LBLRTM Fortran binary (SURVEY.md §2.1); its Python path re-parses
// fixed-column text records one Python object at a time
// (misc/hapi.py:1535-1672). This loader streams HITRAN 160-character .par
// records straight into packed column arrays at IO speed, so multi-hundred-
// megabyte line databases land in the LineStore without a Python-loop pass.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this toolchain):
//   par_count_records(path)            -> number of parseable records
//   par_parse(path, max_records, ...)  -> fills caller-allocated columns
//
// Column layout matches radtxfr_tpu.lines.store._PAR_FIELDS:
//   molec_id [0:2)  local_iso_id [2:3)  nu [3:15)  sw [15:25)  a [25:35)
//   gamma_air [35:40)  gamma_self [40:45)  elower [45:55)  n_air [55:59)
//   delta_air [59:67)
// Iso char mapping per HITRAN/hapi: '0' -> 10, 'A' -> 11, 'B' -> 12.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int kMinLen = 67;

// strtod on a fixed-width field (not NUL-terminated). Fortran-style fields
// may be all blanks -> 0.0.
double field(const char* p, int start, int width) {
    char buf[32];
    if (width >= static_cast<int>(sizeof(buf))) width = sizeof(buf) - 1;
    std::memcpy(buf, p + start, width);
    buf[width] = '\0';
    char* end = nullptr;
    double v = std::strtod(buf, &end);
    return (end == buf) ? 0.0 : v;
}

int32_t iso_char(char c) {
    if (c >= '1' && c <= '9') return c - '0';
    if (c == '0') return 10;
    if (c == 'A' || c == 'a') return 11;
    if (c == 'B' || c == 'b') return 12;
    return -1;
}

// Slurp the whole file (line DBs are at most ~GB; streaming chunked IO can
// come later if needed).
bool slurp(const char* path, std::vector<char>& buf) {
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    buf.resize(static_cast<size_t>(size));
    size_t got = size ? std::fread(buf.data(), 1, size, f) : 0;
    std::fclose(f);
    buf.resize(got);
    return true;
}

// Visit each line as (ptr, len); F returns void.
template <typename F>
void for_each_line(const std::vector<char>& buf, F&& fn) {
    const char* p = buf.data();
    const char* end = p + buf.size();
    while (p < end) {
        const char* nl = static_cast<const char*>(
            std::memchr(p, '\n', static_cast<size_t>(end - p)));
        const char* stop = nl ? nl : end;
        long len = static_cast<long>(stop - p);
        if (len > 0 && p[len - 1] == '\r') --len;
        fn(p, len);
        p = nl ? nl + 1 : end;
    }
}

}  // namespace

extern "C" {

long par_count_records(const char* path) {
    std::vector<char> buf;
    if (!slurp(path, buf)) return -1;
    long n = 0;
    for_each_line(buf, [&](const char* p, long len) {
        if (len >= kMinLen && iso_char(p[2]) >= 0) ++n;
    });
    return n;
}

// Returns the number of records written, or -1 on open failure.
long par_parse(const char* path, long max_records,
               int32_t* mol, int32_t* iso,
               double* nu, double* sw, double* elower,
               double* gamma_air, double* gamma_self,
               double* n_air, double* delta_air) {
    std::vector<char> buf;
    if (!slurp(path, buf)) return -1;
    long n = 0;
    for_each_line(buf, [&](const char* p, long len) {
        if (n >= max_records || len < kMinLen) return;
        int32_t i = iso_char(p[2]);
        if (i < 0) return;
        mol[n] = static_cast<int32_t>(field(p, 0, 2));
        iso[n] = i;
        nu[n] = field(p, 3, 12);
        sw[n] = field(p, 15, 10);
        gamma_air[n] = field(p, 35, 5);
        gamma_self[n] = field(p, 40, 5);
        elower[n] = field(p, 45, 10);
        n_air[n] = field(p, 55, 4);
        delta_air[n] = field(p, 59, 8);
        ++n;
    });
    return n;
}

}  // extern "C"
