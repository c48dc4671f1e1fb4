/* Golden-output generator for the long-tail reference subsystems (round 3):
 * MFCC feature chain, CCTDE, GCC family, spectral subtraction, OverlapAdd/
 * OverlapSave, FastBlockLMS — the UNMODIFIED reference C++ (see
 * golden_main.cc for the harness rationale and ../shim for the GSL shim).
 *
 * File formats (little-endian, headerless):
 *   .f32  float32    .f64  float64    .c128 complex128 interleaved
 *
 * Subcommands:
 *   mfcc    D fftLen powN melN low up ncep fs in.f32 ceps.f32 logmel.f32
 *   cctde   fftLen nheld D in1.f32 in2.f32 out.f64  (per frame: [delay..., cc...])
 *   cctde_all fftLen nheld in1.f32 in2.f32 out.f64  (whole-utterance mode:
 *             CCTDE::allsamples, one row of nheld [delay, cc] pairs)
 *   pca     N dim in.f64 basis.f64 sv.f64 whiten.f64 (PCA::pca_svd of the
 *             row-major [N, dim] input: right basis V, singular values,
 *             whitening 1/sqrt(sv))
 *   locdelays nchan az polar x y z geom.f64 out.f64 (the three free
 *             delay calculators -> 3*nchan doubles)
 *   srpphat delta_f nchan fftLen zPos sx0 sx1 sxstep sy0 sy1 systep
 *             frame.c128 geom.f64 out.f64 (getSrpPhat -> [bestX, bestY])
 *   gcc     kind fftLen D fs alpha beta q interp nr noiseN \
 *           in1.f32 in2.f32 out.f64
 *           (kind: raw|gnnsub|phat|gnnsubphat|mlrraw|mlrgnnsub; the first
 *            noiseN frames accumulate noise statistics (sad=false, no
 *            output row), the rest compute the GCC: [delay,maxcorr,ratio])
 *   specsub h.f64 g.f64 M m r dc alpha floorv trainN in.f32 out.f32
 *   oadd    irlen fftLen L ir.f64 in.f32 out.f32        (OverlapAdd)
 *   osave   irlen L ir.f64 in.f32 out.f32               (OverlapSave)
 *   fblms   N alpha gamma desired.f32 in.f32 out.f32    (FastBlockLMS)
 */

#include "golden_util.h"

#include "feature/feature.h"
#include "modulated/modulated.h"
#include "postfilter/spectralsubtraction.h"
#include "convolution/convolution.h"
#include "lms/lms.h"
#include "localization/localization.h"
#include "localization/mcc_localizer.h"
#include "sad/sad.h"
#include "postfilter/binauralprocessing.h"
#include "feature/spectralestimator.h"
#include "tde/tde.h"
#include "sad/ica.h"

jpython_error::jpython_error() : j_error() {}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s <subcommand> ...\n", argv[0]); return 1; }
  std::string cmd = argv[1];

  if (cmd == "mfcc") {
    /* mfcc D fftLen powN melN low up ncep fs in.f32 ceps.f32 logmel.f32
     * The reference MFCC chain (unit_test/mfcc_extractor.py graph, canonical
     * order): SampleFeature -> Hamming -> FFT -> SpectralPower -> Mel ->
     * Log -> Cepstral. */
    unsigned D = atoi(argv[2]), fftLen = atoi(argv[3]), powN = atoi(argv[4]);
    unsigned melN = atoi(argv[5]);
    double low = atof(argv[6]), up = atof(argv[7]);
    unsigned ncep = atoi(argv[8]);
    double fs = atof(argv[9]);
    std::vector<float> x = read_f32(argv[10]);

    SampleFeaturePtr samp = new SampleFeature("", D, D, false);
    gsl_vector* xs = gsl_vector_calloc(x.size());
    for (size_t i = 0; i < x.size(); i++) gsl_vector_set(xs, i, x[i]);
    samp->setSamples(xs, (unsigned)fs);

    HammingFeaturePtr ham = new HammingFeature((VectorFloatFeatureStreamPtr&)samp);
    FFTFeaturePtr fft = new FFTFeature((VectorFloatFeatureStreamPtr&)ham, fftLen);
    SpectralPowerFeaturePtr pow_ =
        new SpectralPowerFeature((VectorComplexFeatureStreamPtr&)fft, powN);
    MelFeaturePtr mel = new MelFeature((VectorFeatureStreamPtr&)pow_, powN,
                                       (float)fs, (float)low, (float)up, melN, 1);
    LogFeaturePtr logf = new LogFeature((VectorFeatureStreamPtr&)mel);
    CepstralFeaturePtr cep =
        new CepstralFeature((VectorFloatFeatureStreamPtr&)logf, ncep, 1);

    FILE* cfp = fopen(argv[11], "wb");
    FILE* lfp = fopen(argv[12], "wb");
    for (;;) {
      const gsl_vector_float* c;
      try {
        c = cep->next();
      } catch (jiterator_error&) {
        break;
      }
      for (unsigned i = 0; i < ncep; i++) {
        float t = gsl_vector_float_get(c, i);
        fwrite(&t, sizeof(float), 1, cfp);
      }
      const gsl_vector_float* lm = logf->current();
      for (unsigned i = 0; i < melN; i++) {
        float t = gsl_vector_float_get(lm, i);
        fwrite(&t, sizeof(float), 1, lfp);
      }
    }
    fclose(cfp);
    fclose(lfp);
    return 0;
  }

  if (cmd == "cctde") {
    /* cctde fftLen nheld D in1.f32 in2.f32 out.f64
     * CCTDE band-limited PHAT-weighted cross-correlation peaks (tde.cc):
     * per frame dump nheld (delay, cc) pairs. */
    unsigned fftLen = atoi(argv[2]), nheld = atoi(argv[3]), D = atoi(argv[4]);
    std::vector<float> x1 = read_f32(argv[5]);
    std::vector<float> x2 = read_f32(argv[6]);

    SampleFeaturePtr s1 = new SampleFeature("", D, D, false);
    SampleFeaturePtr s2 = new SampleFeature("", D, D, false);
    gsl_vector* v1 = gsl_vector_calloc(x1.size());
    for (size_t i = 0; i < x1.size(); i++) gsl_vector_set(v1, i, x1[i]);
    gsl_vector* v2 = gsl_vector_calloc(x2.size());
    for (size_t i = 0; i < x2.size(); i++) gsl_vector_set(v2, i, x2[i]);
    s1->setSamples(v1, 16000);
    s2->setSamples(v2, 16000);

    CCTDEPtr tde = new CCTDE(s1, s2, fftLen, nheld);
    FILE* fp = fopen(argv[7], "wb");
    for (;;) {
      const gsl_vector* d;
      try {
        d = tde->next();
      } catch (jiterator_error&) {
        break;
      }
      const unsigned* delays = tde->sample_delays();
      const double* ccs = tde->cc_values();
      for (unsigned i = 0; i < nheld; i++) {
        double row[2] = {(double)delays[i], ccs[i]};
        write_f64_buf(fp, row, 2);
      }
      (void)d;
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "locdelays") {
    /* locdelays nchan az polar x y z geom.f64 out.f64
     * The localization free-function delay calculators
     * (localization.cc:94-139): nearfield calcDelays(x,y,z), linear-array
     * calcDelaysOfLinearMicrophoneArray(az), circular-array
     * calcDelaysOfCircularMicrophoneArray(az, polar).  geom row-major
     * [nchan, 3] mm.  Dumps 3*nchan doubles. */
    unsigned nchan = atoi(argv[2]);
    double az = atof(argv[3]), polar = atof(argv[4]);
    int x = atoi(argv[5]), y = atoi(argv[6]), z = atoi(argv[7]);
    std::vector<double> gm = read_f64(argv[8]);
    gsl_matrix* geom = gsl_matrix_calloc(nchan, 3);
    for (unsigned i = 0; i < nchan; i++)
      for (unsigned j = 0; j < 3; j++)
        gsl_matrix_set(geom, i, j, gm[i * 3 + j]);
    gsl_vector* d = gsl_vector_calloc(nchan);
    FILE* fp = fopen(argv[9], "wb");
    calcDelays(x, y, z, geom, d);
    write_f64_buf(fp, d->data, nchan);
    calcDelaysOfLinearMicrophoneArray((float)az, geom, d);
    write_f64_buf(fp, d->data, nchan);
    calcDelaysOfCircularMicrophoneArray((float)az, (float)polar, geom, d);
    write_f64_buf(fp, d->data, nchan);
    fclose(fp);
    return 0;
  }

  if (cmd == "srpphat") {
    /* srpphat delta_f nchan fftLen zPos sx0 sx1 sxstep sy0 sy1 systep
     *         frame.c128 geom.f64 out.f64
     * getSrpPhat (localization.cc:20-92): PHAT-weighted SRP over an
     * integer (x, y) nearfield grid; dumps [bestX, bestY]. */
    double delta_f = atof(argv[2]);
    unsigned nchan = atoi(argv[3]), fftLen = atoi(argv[4]);
    int zPos = atoi(argv[5]);
    gsl_vector* srx = gsl_vector_calloc(3);
    gsl_vector* sry = gsl_vector_calloc(3);
    for (int i = 0; i < 3; i++) {
      gsl_vector_set(srx, i, atof(argv[6 + i]));
      gsl_vector_set(sry, i, atof(argv[9 + i]));
    }
    std::vector<double> fr = read_f64(argv[12]);  // interleaved c128
    gsl_matrix_complex* mfr = gsl_matrix_complex_calloc(nchan, fftLen);
    for (unsigned c = 0; c < nchan; c++)
      for (unsigned j = 0; j < fftLen; j++)
        gsl_matrix_complex_set(
            mfr, c, j,
            gsl_complex_rect(fr[2 * (c * fftLen + j)], fr[2 * (c * fftLen + j) + 1]));
    std::vector<double> gm = read_f64(argv[13]);
    gsl_matrix* geom = gsl_matrix_calloc(nchan, 3);
    for (unsigned i = 0; i < nchan; i++)
      for (unsigned j = 0; j < 3; j++)
        gsl_matrix_set(geom, i, j, gm[i * 3 + j]);

    gsl_vector* best = getSrpPhat(delta_f, mfr, srx, sry, geom, zPos);
    FILE* fp = fopen(argv[14], "wb");
    write_f64_buf(fp, best->data, 2);
    fclose(fp);
    return 0;
  }

  if (cmd == "cctde_all") {
    /* cctde_all fftLen nheld in1.f32 in2.f32 out.f64
     * Whole-utterance CCTDE (tde.cc:70-125): one Hanning-windowed FFT over
     * everything, PHAT cross-correlation, nheld peaks -> [delay, cc] rows.
     * fftLen < 0 lets allsamples() pick the next power of two. */
    int fftLen = atoi(argv[2]);
    unsigned nheld = atoi(argv[3]);
    std::vector<float> x1 = read_f32(argv[4]);
    std::vector<float> x2 = read_f32(argv[5]);

    SampleFeaturePtr s1 = new SampleFeature("", 512, 512, false);
    SampleFeaturePtr s2 = new SampleFeature("", 512, 512, false);
    gsl_vector* v1 = gsl_vector_calloc(x1.size());
    for (size_t i = 0; i < x1.size(); i++) gsl_vector_set(v1, i, x1[i]);
    gsl_vector* v2 = gsl_vector_calloc(x2.size());
    for (size_t i = 0; i < x2.size(); i++) gsl_vector_set(v2, i, x2[i]);
    s1->setSamples(v1, 16000);
    s2->setSamples(v2, 16000);

    CCTDEPtr tde = new CCTDE(s1, s2, 512, nheld);
    tde->allsamples(fftLen);
    const unsigned* delays = tde->sample_delays();
    const double* ccs = tde->cc_values();
    FILE* fp = fopen(argv[6], "wb");
    for (unsigned i = 0; i < nheld; i++) {
      double row[2] = {(double)delays[i], ccs[i]};
      write_f64_buf(fp, row, 2);
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "pca") {
    /* pca N dim in.f64 basis.f64 sv.f64 whiten.f64
     * PCA::pca_svd (sad/ica.cc:24-36): gsl_linalg_SV_decomp of the
     * [N, dim] input; dumps V [dim, dim] row-major, the dim singular
     * values, and whiten = 1/sqrt(sv). */
    unsigned N = atoi(argv[2]), dim = atoi(argv[3]);
    std::vector<double> xs = read_f64(argv[4]);
    gsl_matrix* input = gsl_matrix_calloc(N, dim);
    for (unsigned i = 0; i < N; i++)
      for (unsigned j = 0; j < dim; j++)
        gsl_matrix_set(input, i, j, xs[i * dim + j]);
    gsl_matrix* basis = gsl_matrix_calloc(dim, dim);
    gsl_vector* sv = gsl_vector_calloc(dim);
    gsl_vector* whiten = gsl_vector_calloc(dim);

    PCA pca(dim);
    pca.pca_svd(input, basis, sv, whiten);

    FILE* bf = fopen(argv[5], "wb");
    for (unsigned i = 0; i < dim; i++)
      for (unsigned j = 0; j < dim; j++) {
        double t = gsl_matrix_get(basis, i, j);
        write_f64_buf(bf, &t, 1);
      }
    fclose(bf);
    FILE* sf = fopen(argv[6], "wb");
    for (unsigned i = 0; i < dim; i++) {
      double t = gsl_vector_get(sv, i);
      write_f64_buf(sf, &t, 1);
    }
    fclose(sf);
    FILE* wf = fopen(argv[7], "wb");
    for (unsigned i = 0; i < dim; i++) {
      double t = gsl_vector_get(whiten, i);
      write_f64_buf(wf, &t, 1);
    }
    fclose(wf);
    return 0;
  }

  if (cmd == "gcc") {
    /* gcc kind fftLen D fs alpha beta q interp nr noiseN in1 in2 out.f64
     * GCC family (localization.cc): per frame Hamming+FFT both channels;
     * first noiseN frames feed the noise power/cross spectra (sad=false),
     * then calculate() the weighted cross-spectrum + findMaximum() ->
     * [delay, maxcorr, ratio]. */
    std::string kind = argv[2];
    unsigned fftLen = atoi(argv[3]), D = atoi(argv[4]);
    double fs = atof(argv[5]);
    double alpha = atof(argv[6]), beta = atof(argv[7]), q = atof(argv[8]);
    bool interp = atoi(argv[9]) != 0, nr = atoi(argv[10]) != 0;
    unsigned noiseN = atoi(argv[11]);
    std::vector<float> x1 = read_f32(argv[12]);
    std::vector<float> x2 = read_f32(argv[13]);

    RawSampleFeaturePtr s1 = new RawSampleFeature(x1, D);
    RawSampleFeaturePtr s2 = new RawSampleFeature(x2, D);
    HammingFeaturePtr h1 = new HammingFeature((VectorFloatFeatureStreamPtr&)s1);
    HammingFeaturePtr h2 = new HammingFeature((VectorFloatFeatureStreamPtr&)s2);
    FFTFeaturePtr f1 = new FFTFeature((VectorFloatFeatureStreamPtr&)h1, fftLen);
    FFTFeaturePtr f2 = new FFTFeature((VectorFloatFeatureStreamPtr&)h2, fftLen);

    GCC* gcc;
    if (kind == "raw") gcc = new GCCRaw(fs, fftLen, 2, 1, alpha, beta, q, interp, nr);
    else if (kind == "gnnsub") gcc = new GCCGnnSub(fs, fftLen, 2, 1, alpha, beta, q, interp, nr);
    else if (kind == "phat") gcc = new GCCPhat(fs, fftLen, 2, 1, alpha, beta, q, interp, nr);
    else if (kind == "gnnsubphat") gcc = new GCCGnnSubPhat(fs, fftLen, 2, 1, alpha, beta, q, interp, nr);
    else if (kind == "mlrraw") gcc = new GCCMLRRaw(fs, fftLen, 2, 1, alpha, beta, q, interp, nr);
    else if (kind == "mlrgnnsub") gcc = new GCCMLRGnnSub(fs, fftLen, 2, 1, alpha, beta, q, interp, nr);
    else { fprintf(stderr, "unknown gcc kind %s\n", kind.c_str()); return 1; }

    const char* noisefn = (argc > 15) ? argv[15] : NULL;
    FILE* fp = fopen(argv[14], "wb");
    unsigned frame = 0;
    for (;;) {
      const gsl_vector_complex *X1, *X2;
      try {
        X1 = f1->next();
        X2 = f2->next();
      } catch (jiterator_error&) {
        break;
      }
      double ts = frame * (double)D / fs;
      /* the sad flag selects GCC computation (true) vs noise-statistics
       * accumulation (false), localization.cc:1244-1275 */
      bool is_speech = frame >= noiseN;
      gcc->calculate(X1, 0, X2, 1, 0, ts, is_speech, true);
      if (is_speech && frame == noiseN && noisefn) {
        /* dump the trained noise statistics: N1 [len], N2 [len],
         * Gn1n2 [len] complex (len = fftLen/2+1) */
        FILE* nf = fopen(noisefn, "wb");
        const gsl_vector* N1 = gcc->getNoisePowerSpectrum(0);
        const gsl_vector* N2 = gcc->getNoisePowerSpectrum(1);
        const gsl_vector_complex* G12 = gcc->getNoiseCrossSpectrum(0);
        for (unsigned i = 0; i < N1->size; i++) {
          double v = gsl_vector_get(N1, i);
          fwrite(&v, sizeof(double), 1, nf);
        }
        for (unsigned i = 0; i < N2->size; i++) {
          double v = gsl_vector_get(N2, i);
          fwrite(&v, sizeof(double), 1, nf);
        }
        for (unsigned i = 0; i < G12->size; i++) {
          gsl_complex z = gsl_vector_complex_get(G12, i);
          fwrite(z.dat, sizeof(double), 2, nf);
        }
        fclose(nf);
      }
      if (is_speech) {
        gcc->findMaximum(-HUGE_VAL, HUGE_VAL);
        double row[3] = {gcc->getPeakDelay(), gcc->getPeakCorr(), gcc->getRatio()};
        write_f64_buf(fp, row, 3);
      }
      frame++;
    }
    fclose(fp);
    delete gcc;
    return 0;
  }

  if (cmd == "specsub") {
    /* specsub h.f64 g.f64 M m r dc alpha floorv trainN in.f32 out.f32
     * Spectral subtraction chain (src/ss.cc protocol): drain trainN frames
     * in training mode, stop_training (turns subtraction on), keep
     * draining; all frames written. */
    gsl_vector* h = to_gsl(read_f64(argv[2]));
    gsl_vector* g = to_gsl(read_f64(argv[3]));
    unsigned M = atoi(argv[4]), m = atoi(argv[5]), r = atoi(argv[6]), dc = atoi(argv[7]);
    double alpha = atof(argv[8]), floorv = atof(argv[9]);
    unsigned trainN = atoi(argv[10]);
    std::vector<float> x = read_f32(argv[11]);
    unsigned D = M >> r;

    RawSampleFeaturePtr src = new RawSampleFeature(x, D);
    OverSampledDFTAnalysisBankPtr afb = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)src, h, M, m, r, dc);
    SpectralSubtractorPtr ss = new SpectralSubtractor(M, false, 1.0, (float)floorv);
    VectorComplexFeatureStreamPtr afbc = (VectorComplexFeatureStreamPtr&)afb;
    ss->set_channel(afbc, alpha);
    OverSampledDFTSynthesisBankPtr sfb = new OverSampledDFTSynthesisBank(
        (VectorComplexFeatureStreamPtr&)ss, g, M, m, r, dc);

    FILE* fp = fopen(argv[12], "wb");
    unsigned frame = 0;
    for (;;) {
      const gsl_vector_float* data;
      try {
        data = sfb->next();
      } catch (jiterator_error&) {
        break;
      }
      if (frame == trainN) {
        ss->stop_training();
        ss->start_noise_subtraction();
      }
      for (unsigned i = 0; i < D; i++) {
        float t = gsl_vector_float_get(data, i);
        fwrite(&t, sizeof(float), 1, fp);
      }
      frame++;
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "oadd" || cmd == "osave") {
    /* oadd  irlen fftLen L ir.f64 in.f32 out.f32
     * osave irlen L ir.f64 in.f32 out.f32
     * FFT-domain FIR filtering of a stream (convolution.cc). */
    int argp = 2;
    unsigned irlen = atoi(argv[argp++]);
    unsigned fftLen = (cmd == "oadd") ? atoi(argv[argp++]) : 0;
    unsigned L = atoi(argv[argp++]);
    std::vector<double> ir = read_f64(argv[argp++]);
    std::vector<float> x = read_f32(argv[argp++]);
    const char* outfn = argv[argp++];

    gsl_vector* irv = gsl_vector_calloc(irlen);
    for (unsigned i = 0; i < irlen; i++) gsl_vector_set(irv, i, ir[i]);

    RawSampleFeaturePtr src = new RawSampleFeature(x, L);
    if (cmd == "oadd") {
      OverlapAddPtr oa = new OverlapAdd((VectorFloatFeatureStreamPtr&)src, irv, fftLen);
      drain_to_f32((VectorFloatFeatureStreamPtr&)oa, L, outfn);
    } else {
      OverlapSavePtr os = new OverlapSave((VectorFloatFeatureStreamPtr&)src, irv);
      /* the stream's frame size is L - P (check_output_size_,
       * convolution.cc:179-185) */
      drain_to_f32((VectorFloatFeatureStreamPtr&)os, L - irlen, outfn);
    }
    return 0;
  }

  if (cmd == "sadneg") {
    /* sadneg h.f64 M m r dc fs lpcorder shapedir lowcut highcut \
     *        out.f64 in.f32
     * NegentropyVADMetric (per-bin CGGD-vs-Gaussian log-likelihood ratio,
     * sad.cc:1092-1171) with an LPC spectral-envelope estimator; dumps the
     * per-frame negentropy metric. */
    gsl_vector* h = to_gsl(read_f64(argv[2]));
    unsigned M = atoi(argv[3]), m = atoi(argv[4]), r = atoi(argv[5]), dc = atoi(argv[6]);
    double fs = atof(argv[7]);
    unsigned lpcorder = atoi(argv[8]);
    const char* shapedir = argv[9];
    double lowcut = atof(argv[10]), highcut = atof(argv[11]);
    const char* outfn = argv[12];
    std::vector<float> x = read_f32(argv[13]);
    unsigned D = M >> r;

    RawSampleFeaturePtr src1 = new RawSampleFeature(x, D);
    OverSampledDFTAnalysisBankPtr afb = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)src1, h, M, m, r, dc);
    RawSampleFeaturePtr src2 = new RawSampleFeature(x, D);
    LPCSpectrumEstimatorPtr lpc = new LPCSpectrumEstimator(
        (VectorFloatFeatureStreamPtr&)src2, lpcorder, M);
    VectorComplexFeatureStreamPtr srcc = (VectorComplexFeatureStreamPtr&)afb;
    VectorFloatFeatureStreamPtr estf = (VectorFloatFeatureStreamPtr&)lpc;
    NegentropyVADMetricPtr metric = new NegentropyVADMetric(
        srcc, estf, shapedir, 0.0, fs, lowcut, highcut);
    FILE* fp = fopen(outfn, "wb");
    for (int fr = 0;; fr++) {
      double v;
      try {
        v = metric->calc_negentropy(fr);
      } catch (jiterator_error&) {
        break;
      }
      write_f64_buf(fp, &v, 1);
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "sadmi") {
    /* sadmi h.f64 M m r dc fs lpcorder lowcut highcut out.f64 in1.f32 in2.f32
     * MutualInformationVADMetric (sad.cc:1379-1560) with Gaussian marginal
     * shape (no shape file) and per-channel LPC envelope estimators; dumps
     * the per-frame empirical mutual information. */
    gsl_vector* h = to_gsl(read_f64(argv[2]));
    unsigned M = atoi(argv[3]), m = atoi(argv[4]), r = atoi(argv[5]), dc = atoi(argv[6]);
    double fs = atof(argv[7]);
    unsigned lpcorder = atoi(argv[8]);
    double lowcut = atof(argv[9]), highcut = atof(argv[10]);
    const char* outfn = argv[11];
    std::vector<float> x1 = read_f32(argv[12]);
    std::vector<float> x2 = read_f32(argv[13]);
    unsigned D = M >> r;

    RawSampleFeaturePtr s1a = new RawSampleFeature(x1, D);
    OverSampledDFTAnalysisBankPtr afb1 = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)s1a, h, M, m, r, dc);
    RawSampleFeaturePtr s1b = new RawSampleFeature(x1, D);
    LPCSpectrumEstimatorPtr lpc1 = new LPCSpectrumEstimator(
        (VectorFloatFeatureStreamPtr&)s1b, lpcorder, M);
    RawSampleFeaturePtr s2a = new RawSampleFeature(x2, D);
    OverSampledDFTAnalysisBankPtr afb2 = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)s2a, h, M, m, r, dc);
    RawSampleFeaturePtr s2b = new RawSampleFeature(x2, D);
    LPCSpectrumEstimatorPtr lpc2 = new LPCSpectrumEstimator(
        (VectorFloatFeatureStreamPtr&)s2b, lpcorder, M);

    VectorComplexFeatureStreamPtr src1 = (VectorComplexFeatureStreamPtr&)afb1;
    VectorComplexFeatureStreamPtr src2 = (VectorComplexFeatureStreamPtr&)afb2;
    VectorFloatFeatureStreamPtr est1 = (VectorFloatFeatureStreamPtr&)lpc1;
    VectorFloatFeatureStreamPtr est2 = (VectorFloatFeatureStreamPtr&)lpc2;
    MutualInformationVADMetricPtr metric = new MutualInformationVADMetric(
        src1, src2, est1, est2, "", -1.0, 1.3, 0.95, fs, lowcut, highcut);
    FILE* fp = fopen(outfn, "wb");
    for (int fr = 0;; fr++) {
      double v;
      try {
        v = metric->calc_mutual_information(fr);
      } catch (jiterator_error&) {
        break;
      }
      write_f64_buf(fp, &v, 1);
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "sadlr") {
    /* sadlr h.f64 M m r dc fs lpcorder lowcut highcut out.f64 in1.f32 in2.f32
     * LikelihoodRatioVADMetric (sad.cc:1567-1617): marginal CGGD
     * log-likelihood ratio of the two channels under the pooled envelope
     * scale; dumps the per-frame ratio. */
    gsl_vector* h = to_gsl(read_f64(argv[2]));
    unsigned M = atoi(argv[3]), m = atoi(argv[4]), r = atoi(argv[5]), dc = atoi(argv[6]);
    double fs = atof(argv[7]);
    unsigned lpcorder = atoi(argv[8]);
    double lowcut = atof(argv[9]), highcut = atof(argv[10]);
    const char* outfn = argv[11];
    std::vector<float> x1 = read_f32(argv[12]);
    std::vector<float> x2 = read_f32(argv[13]);
    unsigned D = M >> r;

    RawSampleFeaturePtr s1a = new RawSampleFeature(x1, D);
    OverSampledDFTAnalysisBankPtr afb1 = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)s1a, h, M, m, r, dc);
    RawSampleFeaturePtr s1b = new RawSampleFeature(x1, D);
    LPCSpectrumEstimatorPtr lpc1 = new LPCSpectrumEstimator(
        (VectorFloatFeatureStreamPtr&)s1b, lpcorder, M);
    RawSampleFeaturePtr s2a = new RawSampleFeature(x2, D);
    OverSampledDFTAnalysisBankPtr afb2 = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)s2a, h, M, m, r, dc);
    RawSampleFeaturePtr s2b = new RawSampleFeature(x2, D);
    LPCSpectrumEstimatorPtr lpc2 = new LPCSpectrumEstimator(
        (VectorFloatFeatureStreamPtr&)s2b, lpcorder, M);

    VectorComplexFeatureStreamPtr src1 = (VectorComplexFeatureStreamPtr&)afb1;
    VectorComplexFeatureStreamPtr src2 = (VectorComplexFeatureStreamPtr&)afb2;
    VectorFloatFeatureStreamPtr est1 = (VectorFloatFeatureStreamPtr&)lpc1;
    VectorFloatFeatureStreamPtr est2 = (VectorFloatFeatureStreamPtr&)lpc2;
    LikelihoodRatioVADMetricPtr metric = new LikelihoodRatioVADMetric(
        src1, src2, est1, est2, "", 0.0, fs, lowcut, highcut);
    FILE* fp = fopen(outfn, "wb");
    for (int fr = 0;; fr++) {
      double v;
      try {
        v = metric->calc_likelihood_ratio(fr);
      } catch (jiterator_error&) {
        break;
      }
      write_f64_buf(fp, &v, 1);
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "wgcc") {
    /* wgcc fftLen fs minDelay maxDelay frame.c128 out.f64
     * getWindowedGCC free function (localization.cc): PHAT-weighted CC of
     * channels 0/1, delay-windowed peak with quadratic interpolation;
     * dumps [delay_seconds, peak]. */
    unsigned fftLen = atoi(argv[2]);
    double fs = atof(argv[3]);
    double minD = atof(argv[4]), maxD = atof(argv[5]);
    std::vector<double> fr = read_f64(argv[6]);
    gsl_matrix_complex* mfr = gsl_matrix_complex_calloc(2, fftLen);
    for (unsigned c = 0; c < 2; c++)
      for (unsigned j = 0; j < fftLen; j++)
        gsl_matrix_complex_set(
            mfr, c, j,
            gsl_complex_rect(fr[2 * (c * fftLen + j)], fr[2 * (c * fftLen + j) + 1]));
    const gsl_vector* res = getWindowedGCC(mfr, fs, minD, maxD);
    FILE* fp = fopen(argv[7], "wb");
    write_f64_buf(fp, res->data, 2);
    fclose(fp);
    return 0;
  }

  if (cmd == "sadlfer") {
    /* sadlfer lagsN D out.f64 lowpass.f64 in.f32
     * LowFullBandEnergyRatioVADMetric (sad.cc:1649-1701): per-lag
     * normalized autocorrelation, Toeplitz quadratic form through the
     * never-zeroed scratch accumulator; dumps the per-frame ratio. */
    unsigned lagsN = atoi(argv[2]), D = atoi(argv[3]);
    const char* outfn = argv[4];
    std::vector<double> lp = read_f64(argv[5]);
    std::vector<float> x = read_f32(argv[6]);

    gsl_vector* lowpass = gsl_vector_calloc(lagsN);
    for (unsigned i = 0; i < lagsN; i++) gsl_vector_set(lowpass, i, lp[i]);
    RawSampleFeaturePtr src = new RawSampleFeature(x, D);
    VectorFloatFeatureStreamPtr s = (VectorFloatFeatureStreamPtr&)src;
    LowFullBandEnergyRatioVADMetricPtr metric =
        new LowFullBandEnergyRatioVADMetric(s, lowpass, 0.5);
    FILE* fp = fopen(outfn, "wb");
    for (int fr = 0;; fr++) {
      double v;
      try {
        v = metric->next(fr);
      } catch (jiterator_error&) {
        break;
      }
      write_f64_buf(fp, &v, 1);
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "mcc") {
    /* mcc nbest dist fs blockLen nframes out.f64 in1.f32 [...]
     * MCCLocalizer over an SGB4LinearArray far-field grid
     * (mcc_localizer.cc): per frame dump nbest rows of
     * [mccc, azimuth, tau_0..tau_{C-1}]. */
    unsigned nbest = atoi(argv[2]);
    double dist = atof(argv[3]);
    unsigned fs = atoi(argv[4]);
    unsigned blockLen = atoi(argv[5]);
    unsigned nframes = atoi(argv[6]);
    const char* outfn = argv[7];
    int argp = 8;
    unsigned chanN = argc - argp;

    SGB4LinearArrayPtr sgb = new SGB4LinearArray(chanN, true, fs);
    sgb->setDistanceBtwMicrophones((float)dist);
    MCCLocalizerPtr loc = new MCCLocalizer((SearchGridBuilderPtr&)sgb, nbest);
    std::vector<RawSampleFeaturePtr> srcs;
    for (; argp < argc; argp++) {
      std::vector<float> x = read_f32(argv[argp]);
      RawSampleFeaturePtr src = new RawSampleFeature(x, blockLen);
      VectorFloatFeatureStreamPtr s = (VectorFloatFeatureStreamPtr&)src;
      loc->setChannel(s);
      srcs.push_back(src);
    }
    FILE* fp = fopen(outfn, "wb");
    for (unsigned fr = 0; fr < nframes; fr++) {
      loc->next(fr);
      for (unsigned nth = 0; nth < nbest; nth++) {
        double mccc = loc->getNthBestMCCC(nth);
        const gsl_vector* pos = loc->getNthBestPosition(nth);
        double az = gsl_vector_get(pos, 1);
        write_f64_buf(fp, &mccc, 1);
        write_f64_buf(fp, &az, 1);
        for (unsigned c = 0; c < chanN; c++) {
          double t = (double)loc->getNthBestDelayedSample(nth, c);
          write_f64_buf(fp, &t, 1);
        }
      }
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "sadenergy") {
    /* sadenergy initial threshold headN tailN energiesN D in.f32 out.f64
     * EnergyVADMetric: percentile noise-floor energy detector + hangover
     * machine (sad.cc:301-366, 555-600), per-frame metric dump. */
    double initial = atof(argv[2]), threshold = atof(argv[3]);
    unsigned headN = atoi(argv[4]), tailN = atoi(argv[5]), energiesN = atoi(argv[6]);
    unsigned D = atoi(argv[7]);
    std::vector<float> x = read_f32(argv[8]);
    RawSampleFeaturePtr src = new RawSampleFeature(x, D);
    EnergyVADMetricPtr metric = new EnergyVADMetric(
        (VectorFloatFeatureStreamPtr&)src, initial, threshold, headN, tailN,
        energiesN);
    FILE* fp = fopen(argv[9], "wb");
    for (;;) {
      double v;
      try {
        v = metric->next();
      } catch (jiterator_error&) {
        break;
      }
      write_f64_buf(fp, &v, 1);
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "sadpower") {
    /* sadpower kind fftLen D fs lowcut highcut E0 out.f64 in1.f32 in2.f32...
     * PowerSpectrumVADMetric (kind=power) / NormalizedEnergyMetric
     * (kind=normenergy) over per-channel Hamming+FFT power spectra
     * (sad.cc:665-830). */
    std::string kind = argv[2];
    unsigned fftLen = atoi(argv[3]), D = atoi(argv[4]);
    double fs = atof(argv[5]);
    double lowcut = atof(argv[6]), highcut = atof(argv[7]);
    double E0 = atof(argv[8]);
    const char* outfn = argv[9];
    int argp = 10;

    PowerSpectrumVADMetricPtr metric;
    if (kind == "power")
      metric = new PowerSpectrumVADMetric(fftLen, fs, lowcut, highcut);
    else if (kind == "normenergy")
      metric = (PowerSpectrumVADMetricPtr)new NormalizedEnergyMetric(
          fftLen, fs, lowcut, highcut);
    else if (kind == "tsps")
      metric = (PowerSpectrumVADMetricPtr)new TSPSVADMetric(
          fftLen, fs, lowcut, highcut);
    else { fprintf(stderr, "unknown sadpower kind %s\n", kind.c_str()); return 1; }
    metric->set_E0( E0 );

    std::vector<RawSampleFeaturePtr> srcs;
    std::vector<HammingFeaturePtr> hams;
    std::vector<FFTFeaturePtr> ffts;
    std::vector<SpectralPowerFloatFeaturePtr> pows;
    for (; argp < argc; argp++) {
      std::vector<float> x = read_f32(argv[argp]);
      RawSampleFeaturePtr src = new RawSampleFeature(x, D);
      HammingFeaturePtr ham = new HammingFeature((VectorFloatFeatureStreamPtr&)src);
      FFTFeaturePtr fft = new FFTFeature((VectorFloatFeatureStreamPtr&)ham, fftLen);
      SpectralPowerFloatFeaturePtr pw =
          new SpectralPowerFloatFeature((VectorComplexFeatureStreamPtr&)fft, fftLen);
      metric->set_channel((VectorFloatFeatureStreamPtr&)pw);
      srcs.push_back(src);
      hams.push_back(ham);
      ffts.push_back(fft);
      pows.push_back(pw);
    }
    FILE* fp = fopen(outfn, "wb");
    for (;;) {
      double v;
      try {
        v = metric->next();
      } catch (jiterator_error&) {
        break;
      }
      write_f64_buf(fp, &v, 1);
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "vtln") {
    /* vtln version coeffN ratio edge fftLen D in.f32 out.f64
     * VTLNFeature both warp versions (feature.cc nextOrg / nextFF) over a
     * Hamming+FFT+SpectralPower chain; per frame dump coeffN doubles. */
    int version = atoi(argv[2]);
    unsigned coeffN = atoi(argv[3]);
    double ratio = atof(argv[4]), edge = atof(argv[5]);
    unsigned fftLen = atoi(argv[6]), D = atoi(argv[7]);
    std::vector<float> x = read_f32(argv[8]);

    RawSampleFeaturePtr src = new RawSampleFeature(x, D);
    HammingFeaturePtr ham = new HammingFeature((VectorFloatFeatureStreamPtr&)src);
    FFTFeaturePtr fft = new FFTFeature((VectorFloatFeatureStreamPtr&)ham, fftLen);
    SpectralPowerFeaturePtr pow_ =
        new SpectralPowerFeature((VectorComplexFeatureStreamPtr&)fft, coeffN);
    VTLNFeaturePtr vt = new VTLNFeature((VectorFeatureStreamPtr&)pow_, coeffN,
                                        ratio, edge, version);
    FILE* fp = fopen(argv[9], "wb");
    for (;;) {
      const gsl_vector* v;
      try {
        v = vt->next();
      } catch (jiterator_error&) {
        break;
      }
      write_f64_buf(fp, v->data, coeffN);
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "sadccc") {
    /* sadccc fftLen nCand D fs lowcut highcut threshold out.f64 in1.f32 ...
     * CCCVADMetric (sad.cc:832-980): PHAT cross-spectrum ref-vs-each,
     * inverse FFT, the reference's quirky N-candidate loop; per frame
     * dump [decision, score]. */
    unsigned fftLen = atoi(argv[2]), nCand = atoi(argv[3]), D = atoi(argv[4]);
    double fs = atof(argv[5]);
    double lowcut = atof(argv[6]), highcut = atof(argv[7]);
    double thresh = atof(argv[8]);
    const char* outfn = argv[9];
    int argp = 10;

    CCCVADMetricPtr metric = new CCCVADMetric(fftLen, nCand, fs, lowcut, highcut);
    metric->set_threshold(thresh);

    std::vector<RawSampleFeaturePtr> srcs;
    std::vector<HammingFeaturePtr> hams;
    std::vector<FFTFeaturePtr> ffts;
    for (; argp < argc; argp++) {
      std::vector<float> x = read_f32(argv[argp]);
      RawSampleFeaturePtr src = new RawSampleFeature(x, D);
      HammingFeaturePtr ham = new HammingFeature((VectorFloatFeatureStreamPtr&)src);
      FFTFeaturePtr fft = new FFTFeature((VectorFloatFeatureStreamPtr&)ham, fftLen);
      VectorComplexFeatureStreamPtr cfp = (VectorComplexFeatureStreamPtr&)fft;
      metric->set_channel(cfp);
      srcs.push_back(src);
      hams.push_back(ham);
      ffts.push_back(fft);
    }
    FILE* fp = fopen(outfn, "wb");
    for (;;) {
      double row[2];
      try {
        row[0] = metric->next();
      } catch (jiterator_error&) {
        break;
      }
      row[1] = metric->score();
      write_f64_buf(fp, row, 2);
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "lpcspec" || cmd == "cepspec") {
    /* lpcspec order fftLen D in.f32 out.f32
     * cepspec order fftLen logpad D in.f32 out.f32
     * LPC / cepstral spectral-envelope estimators
     * (feature/spectralestimator.cc). */
    int argp = 2;
    unsigned order = atoi(argv[argp++]);
    unsigned fftLen = atoi(argv[argp++]);
    double logpad = 1.0;
    if (cmd == "cepspec") logpad = atof(argv[argp++]);
    unsigned D = atoi(argv[argp++]);
    std::vector<float> x = read_f32(argv[argp++]);
    const char* outfn = argv[argp++];

    RawSampleFeaturePtr src = new RawSampleFeature(x, D);
    VectorFloatFeatureStreamPtr est;
    HammingFeaturePtr ham;
    FFTFeaturePtr fft;
    if (cmd == "lpcspec") {
      est = new LPCSpectrumEstimator((VectorFloatFeatureStreamPtr&)src, order, fftLen);
    } else {
      ham = new HammingFeature((VectorFloatFeatureStreamPtr&)src);
      fft = new FFTFeature((VectorFloatFeatureStreamPtr&)ham, fftLen);
      VectorComplexFeatureStreamPtr fftc = (VectorComplexFeatureStreamPtr&)fft;
      est = new CepstralSpectrumEstimator(fftc, order, fftLen, logpad);
    }
    FILE* fp = fopen(outfn, "wb");
    unsigned sz = est->size();
    for (;;) {
      const gsl_vector_float* v;
      try {
        v = est->next();
      } catch (jiterator_error&) {
        break;
      }
      for (unsigned i = 0; i < sz; i++) {
        float t = gsl_vector_float_get(v, i);
        fwrite(&t, sizeof(float), 1, fp);
      }
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "binaural") {
    /* binaural chanX M m r dc threshold alpha dEta dpc out.c128 inL inR
     * KimBinaryMaskFilter (ITD-threshold binary masking, C. Kim
     * Interspeech'10; binauralprocessing.cc) over two ODFT analysis
     * streams; needs h.f64 first: binaural h.f64 chanX M m r dc ... */
    gsl_vector* h = to_gsl(read_f64(argv[2]));
    unsigned chanX = atoi(argv[3]);
    unsigned M = atoi(argv[4]), m = atoi(argv[5]), r = atoi(argv[6]), dc = atoi(argv[7]);
    double threshold = atof(argv[8]), alpha = atof(argv[9]);
    double dEta = atof(argv[10]), dpc = atof(argv[11]);
    const char* outfn = argv[12];
    std::vector<float> xl = read_f32(argv[13]);
    std::vector<float> xr = read_f32(argv[14]);
    unsigned D = M >> r;

    RawSampleFeaturePtr sl = new RawSampleFeature(xl, D);
    RawSampleFeaturePtr sr = new RawSampleFeature(xr, D);
    OverSampledDFTAnalysisBankPtr al = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)sl, h, M, m, r, dc);
    OverSampledDFTAnalysisBankPtr ar = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)sr, h, M, m, r, dc);
    VectorComplexFeatureStreamPtr alc = (VectorComplexFeatureStreamPtr&)al;
    VectorComplexFeatureStreamPtr arc = (VectorComplexFeatureStreamPtr&)ar;
    KimBinaryMaskFilterPtr mask = new KimBinaryMaskFilter(
        chanX, alc, arc, M, (float)threshold, (float)alpha, (float)dEta,
        (float)dpc);
    FILE* fp = fopen(outfn, "wb");
    for (;;) {
      const gsl_vector_complex* Y;
      try {
        Y = mask->next();
      } catch (jiterator_error&) {
        break;
      }
      for (unsigned k = 0; k < M; k++) {
        gsl_complex z = gsl_vector_complex_get(Y, k);
        fwrite(z.dat, sizeof(double), 2, fp);
      }
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "iid_mask") {
    /* iid_mask h.f64 chanX M m r dc threshold alpha dEta out.c128 inL inR
     * IIDBinaryMaskFilter (magnitude-difference binary masking,
     * binauralprocessing.cc:438-520). */
    gsl_vector* h = to_gsl(read_f64(argv[2]));
    unsigned chanX = atoi(argv[3]);
    unsigned M = atoi(argv[4]), m = atoi(argv[5]), r = atoi(argv[6]), dc = atoi(argv[7]);
    double threshold = atof(argv[8]), alpha = atof(argv[9]);
    double dEta = atof(argv[10]);
    const char* outfn = argv[11];
    std::vector<float> xl = read_f32(argv[12]);
    std::vector<float> xr = read_f32(argv[13]);
    unsigned D = M >> r;
    RawSampleFeaturePtr sl = new RawSampleFeature(xl, D);
    RawSampleFeaturePtr sr = new RawSampleFeature(xr, D);
    OverSampledDFTAnalysisBankPtr al = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)sl, h, M, m, r, dc);
    OverSampledDFTAnalysisBankPtr ar = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)sr, h, M, m, r, dc);
    VectorComplexFeatureStreamPtr alc = (VectorComplexFeatureStreamPtr&)al;
    VectorComplexFeatureStreamPtr arc = (VectorComplexFeatureStreamPtr&)ar;
    IIDBinaryMaskFilterPtr mask = new IIDBinaryMaskFilter(
        chanX, alc, arc, M, (float)threshold, (float)alpha, (float)dEta);
    FILE* fp = fopen(outfn, "wb");
    for (;;) {
      const gsl_vector_complex* Y;
      try {
        Y = mask->next();
      } catch (jiterator_error&) {
        break;
      }
      for (unsigned k = 0; k < M; k++) {
        gsl_complex z = gsl_vector_complex_get(Y, k);
        fwrite(z.dat, sizeof(double), 2, fp);
      }
    }
    fclose(fp);
    return 0;
  }

  if (cmd == "iid_thresh" || cmd == "fdiid_thresh") {
    /* iid_thresh   h.f64 M m r dc minTh maxTh width dEta dpc out.f64 inL inR
     * fdiid_thresh h.f64 M m r dc minTh maxTh width dEta dpc out.f64 inL inR
     * IIDThresholdEstimator (joint-kurtosis threshold search,
     * binauralprocessing.cc:524-684) / FDIIDThresholdEstimator (per-bin
     * search, :700-920).  Dumps the estimated threshold then the cost
     * function (nCand values; per-bin for fdiid: (M/2+1) rows). */
    bool fd = (cmd == "fdiid_thresh");
    gsl_vector* h = to_gsl(read_f64(argv[2]));
    unsigned M = atoi(argv[3]), m = atoi(argv[4]), r = atoi(argv[5]), dc = atoi(argv[6]);
    double minTh = atof(argv[7]), maxTh = atof(argv[8]), width = atof(argv[9]);
    double dEta = atof(argv[10]), dpc = atof(argv[11]);
    const char* outfn = argv[12];
    std::vector<float> xl = read_f32(argv[13]);
    std::vector<float> xr = read_f32(argv[14]);
    unsigned D = M >> r;
    RawSampleFeaturePtr sl = new RawSampleFeature(xl, D);
    RawSampleFeaturePtr sr = new RawSampleFeature(xr, D);
    OverSampledDFTAnalysisBankPtr al = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)sl, h, M, m, r, dc);
    OverSampledDFTAnalysisBankPtr ar = new OverSampledDFTAnalysisBank(
        (VectorFloatFeatureStreamPtr&)sr, h, M, m, r, dc);
    VectorComplexFeatureStreamPtr alc = (VectorComplexFeatureStreamPtr&)al;
    VectorComplexFeatureStreamPtr arc = (VectorComplexFeatureStreamPtr&)ar;
    FILE* fp = fopen(outfn, "wb");
    if (!fd) {
      IIDThresholdEstimatorPtr est = new IIDThresholdEstimator(
          alc, arc, M, (float)minTh, (float)maxTh, (float)width,
          -1.0f, -1.0f, -1, (float)dEta, (float)dpc);
      for (;;) {
        try {
          est->next();
        } catch (jiterator_error&) {
          break;
        }
      }
      double th = est->calc_threshold();
      fwrite(&th, sizeof(double), 1, fp);
      const gsl_vector* cf = est->cost_function();
      for (unsigned i = 0; i < cf->size; i++) {
        double v = gsl_vector_get(cf, i);
        fwrite(&v, sizeof(double), 1, fp);
      }
    } else {
      FDIIDThresholdEstimatorPtr est = new FDIIDThresholdEstimator(
          alc, arc, M, (float)minTh, (float)maxTh, (float)width,
          (float)dEta, (float)dpc);
      for (;;) {
        try {
          est->next();
        } catch (jiterator_error&) {
          break;
        }
      }
      double th = est->calc_threshold();
      fwrite(&th, sizeof(double), 1, fp);
      for (unsigned fb = 0; fb <= M / 2; fb++) {
        const gsl_vector* cf = est->cost_function(fb);
        for (unsigned i = 0; i < cf->size; i++) {
          double v = gsl_vector_get(cf, i);
          fwrite(&v, sizeof(double), 1, fp);
        }
      }
    }
    fclose(fp);
    return 0;
  }

  /* NOTE on FastBlockLMSFeature (lms/lms.cc): no golden subcommand is
   * possible for it — the shipped constructor builds `new OverlapSave(samp)`
   * with the default NULL impulse response, and OverlapSave's initializer
   * list dereferences `impulseResponse->size` (convolution.cc:146-148)
   * before the NULL check in set_impulse_response_ can run, so ANY
   * construction of FastBlockLMSFeature segfaults (its update() would also
   * overflow the L/2+1-entry frequencyResponse_ buffer with an L-entry
   * delta).  The class is unrunnable as shipped; see PARITY.md. */

  fprintf(stderr, "unknown subcommand %s\n", cmd.c_str());
  return 1;
}
