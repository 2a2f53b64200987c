/* Minimal fftw3f-compatible shim — just enough surface to compile and
 * run the reference's offline searcher (it uses only 1-D complex float
 * in-place plans: reference c/search_offline.cpp:64,78-79,105,161).
 *
 * Backed by an original mixed-radix (2/5) Cooley-Tukey implementation in
 * shim_fft.cpp — no FFTW code anywhere.  Purpose: build the actual
 * reference gps_test binary (blocked upstream only by the missing fftw3
 * library) so golden parity can be checked against the real compiled
 * program, not a reimplementation.
 */
#ifndef TPU_GNSS_FFTW_SHIM_H
#define TPU_GNSS_FFTW_SHIM_H

#ifdef __cplusplus
extern "C" {
#endif

typedef float fftwf_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE (0U)

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags);
void fftwf_execute(fftwf_plan p);
void fftwf_destroy_plan(fftwf_plan p);
void *fftwf_malloc(unsigned long n);
void fftwf_free(void *p);

#ifdef __cplusplus
}
#endif

#endif /* TPU_GNSS_FFTW_SHIM_H */
