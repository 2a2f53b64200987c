#!/bin/bash
# Build the REFERENCE's gps_test binary against our fftw3f shim
# (tpu_gnss/native/fftw_shim) so golden parity can be diffed against the
# actually-compiled upstream program.  Upstream's Makefile needs fftw3
# static libs that aren't in this image; the shim provides the five
# fftwf_* symbols the offline searcher uses, backed by an original
# mixed-radix FFT.
#
# IMPORTANT —--sort-section=name: the reference's Sample() overruns
# fwd_buf by 960 complex samples (it ingests whole 512-byte packets
# until i >= FFT_LEN, reaching 40960 of a 40000 buffer,
# c/search_offline.cpp:134-158).  Where those 7680 bytes land depends on
# .bss layout: with default ordering here they land in code[0] and
# corrupt SV 0's cached spectrum every block.  Sorted data sections put
# rev_buf after fwd_buf (overwritten before every use), reproducing the
# benign layout of the author's original build (whose published results
# include clean SV-0 detections).
#
# Usage: build_ref_gps_test.sh [outfile] [reference_dir]
set -e
OUT="${1:-/tmp/ref_gps_test}"
REF="${2:-/root/reference}"
SHIM="$(dirname "$0")/../tpu_gnss/native/fftw_shim"
g++ -O3 -fcx-limited-range -include cstdio -fdata-sections -Wl,--sort-section=name \
    -I"$REF/c" -I"$SHIM" \
    "$REF/c/test_search_offline.cpp" "$REF/c/search_offline.cpp" \
    "$SHIM/shim_fft.cpp" -lm -o "$OUT"
echo "built $OUT"
