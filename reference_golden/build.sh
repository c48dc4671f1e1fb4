#!/bin/bash
# Build the golden-output generator: the UNMODIFIED reference BTK 2.0 C++
# sources (read-only at /root/reference/btk20_src) compiled against the GSL
# shim in shim/gsl (GSL itself is not installed in this image).
set -e
cd "$(dirname "$0")"
REF=/root/reference/btk20_src
OUT=${1:-build}
mkdir -p "$OUT"

EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
CXXFLAGS="-O2 -std=c++14 -w -I shim -I $REF -I $EIGEN -Wl,--allow-multiple-definition"

COMMON_SRCS="$REF/stream/stream.cc \
  $REF/modulated/modulated.cc \
  $REF/matrix/gslmatrix.cc \
  $REF/matrix/linpack_c.cc \
  $REF/matrix/blas1_c.cc \
  $REF/common/jexception.cc \
  $REF/common/common.cc \
  $REF/common/refcount.cc \
  $REF/common/memory_manager.cc \
  $REF/common/mach_ind_io.cc"

g++ $CXXFLAGS -o "$OUT/golden_main" \
  drivers/golden_main.cc \
  $REF/square_root/square_root.cc \
  $REF/beamformer/beamformer.cc \
  $REF/beamformer/modalbeamformer.cc \
  $REF/beamformer/tracker.cc \
  $REF/beamformer/taylorseries.cc \
  $REF/beamformer/coefficients.cc \
  $REF/postfilter/postfilter.cc \
  $REF/dereverberation/dereverberation.cc \
  $REF/aec/aec.cc \
  $COMMON_SRCS

echo "built $OUT/golden_main"

# Long-tail driver (round 3): MFCC chain, CCTDE, GCC family, spectral
# subtraction, OverlapAdd/Save, FastBlockLMS — plus the TUs they pull in.
g++ $CXXFLAGS -o "$OUT/golden_tail" \
  drivers/golden_tail.cc \
  $REF/feature/feature.cc \
  $REF/feature/lpc.cc \
  $REF/feature/spectralestimator.cc \
  $REF/localization/localization.cc \
  $REF/localization/mcc_localizer.cc \
  $REF/tde/tde.cc \
  $REF/convolution/convolution.cc \
  $REF/lms/lms.cc \
  $REF/postfilter/spectralsubtraction.cc \
  $REF/postfilter/binauralprocessing.cc \
  $REF/square_root/square_root.cc \
  $REF/sad/sad.cc \
  $REF/sad/sad_feature.cc \
  $REF/sad/ica.cc \
  $REF/sad/neural_spnsp_det.c \
  $COMMON_SRCS

echo "built $OUT/golden_tail"
