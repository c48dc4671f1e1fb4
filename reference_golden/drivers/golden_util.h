/* Shared helpers for the golden-output drivers (see golden_main.cc). */
#ifndef GOLDEN_UTIL_H
#define GOLDEN_UTIL_H

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "common/jpython_error.h"
#include "stream/stream.h"

static std::vector<float> read_f32(const char* fn) {
  FILE* fp = fopen(fn, "rb");
  if (!fp) { fprintf(stderr, "cannot open %s\n", fn); exit(1); }
  fseek(fp, 0, SEEK_END);
  long n = ftell(fp) / (long)sizeof(float);
  fseek(fp, 0, SEEK_SET);
  std::vector<float> v(n);
  if (fread(v.data(), sizeof(float), n, fp) != (size_t)n) exit(1);
  fclose(fp);
  return v;
}

static std::vector<double> read_f64(const char* fn) {
  FILE* fp = fopen(fn, "rb");
  if (!fp) { fprintf(stderr, "cannot open %s\n", fn); exit(1); }
  fseek(fp, 0, SEEK_END);
  long n = ftell(fp) / (long)sizeof(double);
  fseek(fp, 0, SEEK_SET);
  std::vector<double> v(n);
  if (fread(v.data(), sizeof(double), n, fp) != (size_t)n) exit(1);
  fclose(fp);
  return v;
}

static gsl_vector* to_gsl(const std::vector<double>& v) {
  gsl_vector* g = gsl_vector_calloc(v.size());
  for (size_t i = 0; i < v.size(); i++) gsl_vector_set(g, i, v[i]);
  return g;
}

/* SampleFeature equivalent fed from memory (replicates the framing of
 * feature/feature.cc:605-646 with blockLen == shiftLen == D, padZeros=true,
 * without the libsndfile dependency). */
class RawSampleFeature : public VectorFloatFeatureStream {
 public:
  RawSampleFeature(const std::vector<float>& samples, unsigned blockLen,
                   const String& nm = "RawSample")
      : VectorFloatFeatureStream(blockLen, nm), samples_(samples), cur_(0) {}

  virtual const gsl_vector_float* next(int frame_no = -5) {
    if (frame_no == frame_no_) return vector_;
    if (cur_ >= samples_.size()) {
      is_end_ = true;
      throw jiterator_error("end of samples!");
    }
    gsl_vector_float_set_zero(vector_);
    size_t remaining = samples_.size() - cur_;
    size_t n = std::min((size_t)size(), remaining);
    for (size_t i = 0; i < n; i++) gsl_vector_float_set(vector_, i, samples_[cur_ + i]);
    cur_ += size();
    increment_();
    return vector_;
  }

  virtual void reset() {
    cur_ = 0;
    VectorFloatFeatureStream::reset();
  }

 private:
  const std::vector<float> samples_;
  size_t cur_;
};

typedef Inherit<RawSampleFeature, VectorFloatFeatureStreamPtr> RawSampleFeaturePtr;

/* pull the sink until end-of-stream, appending D samples per frame */
static void drain_to_f32(VectorFloatFeatureStreamPtr sink, unsigned D, const char* outfn) {
  FILE* fp = fopen(outfn, "wb");
  if (!fp) { fprintf(stderr, "cannot open %s\n", outfn); exit(1); }
  for (;;) {
    const gsl_vector_float* data;
    try {
      data = sink->next();
    } catch (jiterator_error&) {
      break;
    }
    for (unsigned i = 0; i < D; i++) {
      float t = gsl_vector_float_get(data, i);
      fwrite(&t, sizeof(float), 1, fp);
    }
  }
  fclose(fp);
}

static void write_f64_buf(FILE* fp, const double* v, size_t n) {
  fwrite(v, sizeof(double), n, fp);
}

#endif /* GOLDEN_UTIL_H */
