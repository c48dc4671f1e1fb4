/* Minimal libsndfile API stub — type/constant/prototype surface only, just
 * enough to compile reference headers that declare sndfile-typed members
 * (feature/feature.h).  The golden drivers never compile feature.cc, so none
 * of these functions are referenced at link time.  Written from the
 * documented libsndfile API. */
#ifndef SNDFILE_SHIM_H
#define SNDFILE_SHIM_H

#include <stdio.h>
#include <stdint.h>

typedef struct SNDFILE_tag SNDFILE;
typedef int64_t sf_count_t;

typedef struct {
  sf_count_t frames;
  int samplerate;
  int channels;
  int format;
  int sections;
  int seekable;
} SF_INFO;

enum {
  SF_FORMAT_WAV = 0x010000,
  SF_FORMAT_NIST = 0x020000,
  SF_FORMAT_RAW = 0x040000,
  SF_FORMAT_PCM_S8 = 0x0001,
  SF_FORMAT_PCM_16 = 0x0002,
  SF_FORMAT_PCM_24 = 0x0003,
  SF_FORMAT_PCM_32 = 0x0004,
  SF_FORMAT_FLOAT = 0x0006,
  SF_FORMAT_SUBMASK = 0x0000FFFF,
  SF_FORMAT_TYPEMASK = 0x0FFF0000,
  SFM_READ = 0x10,
  SFM_WRITE = 0x20,
  SFM_RDWR = 0x30,
  SFC_SET_NORM_FLOAT = 0x1012,
  SF_FALSE = 0,
  SF_TRUE = 1,
  SF_ERR_NO_ERROR = 0
};

/* Definitions abort if reached: the golden drivers feed samples from memory
 * (RawSampleFeature), so no sndfile entry point ever executes — these exist
 * so TUs that reference them (feature.cc) can LINK. */
static inline void sf_shim_unreachable_(const char* fn) {
  fprintf(stderr, "sndfile shim: %s called (unsupported in golden harness)\n", fn);
  abort();
}
static inline SNDFILE* sf_open(const char* path, int mode, SF_INFO* sfinfo) {
  (void)path; (void)mode; (void)sfinfo;
  sf_shim_unreachable_("sf_open");
  return 0;
}
static inline int sf_close(SNDFILE* sndfile) { (void)sndfile; return 0; }
static inline int sf_error(SNDFILE* sndfile) { (void)sndfile; return 0; }
static inline const char* sf_strerror(SNDFILE* sndfile) {
  (void)sndfile;
  return "sndfile shim";
}
static inline int sf_perror(SNDFILE* sndfile) { (void)sndfile; return 0; }
static inline int sf_command(SNDFILE* sndfile, int cmd, void* data, int datasize) {
  (void)sndfile; (void)cmd; (void)data; (void)datasize;
  return 0;
}
static inline sf_count_t sf_seek(SNDFILE* sndfile, sf_count_t frames, int whence) {
  (void)sndfile; (void)frames; (void)whence;
  sf_shim_unreachable_("sf_seek");
  return 0;
}
static inline sf_count_t sf_readf_float(SNDFILE* sndfile, float* ptr, sf_count_t frames) {
  (void)sndfile; (void)ptr; (void)frames;
  sf_shim_unreachable_("sf_readf_float");
  return 0;
}
static inline sf_count_t sf_writef_float(SNDFILE* sndfile, const float* ptr, sf_count_t frames) {
  (void)sndfile; (void)ptr; (void)frames;
  sf_shim_unreachable_("sf_writef_float");
  return 0;
}
static inline sf_count_t sf_readf_short(SNDFILE* sndfile, short* ptr, sf_count_t frames) {
  (void)sndfile; (void)ptr; (void)frames;
  sf_shim_unreachable_("sf_readf_short");
  return 0;
}
static inline sf_count_t sf_writef_short(SNDFILE* sndfile, const short* ptr, sf_count_t frames) {
  (void)sndfile; (void)ptr; (void)frames;
  sf_shim_unreachable_("sf_writef_short");
  return 0;
}
static inline sf_count_t sf_writef_int(SNDFILE* sndfile, const int* ptr, sf_count_t frames) {
  (void)sndfile; (void)ptr; (void)frames;
  sf_shim_unreachable_("sf_writef_int");
  return 0;
}
static inline sf_count_t sf_read_float(SNDFILE* sndfile, float* ptr, sf_count_t items) {
  (void)sndfile; (void)ptr; (void)items;
  sf_shim_unreachable_("sf_read_float");
  return 0;
}
static inline sf_count_t sf_write_float(SNDFILE* sndfile, const float* ptr, sf_count_t items) {
  (void)sndfile; (void)ptr; (void)items;
  sf_shim_unreachable_("sf_write_float");
  return 0;
}

#endif /* SNDFILE_SHIM_H */
