"""Fused MXU DFT-correlate-reduce kernels for folded acquisition.

The XLA folded engine materializes the per-(SV x Doppler) spectrum
product and its inverse FFT in HBM (~350 MB of traffic per coherent
block) because the FFT is an unfusable custom call.  These kernels
remove that round trip using the classic four-step DFT factorization
NF = n1*n2, which turns both transforms into MXU matrix multiplies:

    corr[n1*q + t] = (E1 @ M * tw) @ E2   at cell [t, q]

* :func:`corr_reduce` (v1) takes precomputed data spectra and computes,
  per SV, the inverse DFT as two [n1,n1]x[n1,n2] complex matmuls.
* :func:`fold_corr_reduce` (v2, the production path) additionally pulls
  the **forward** DFT of the wiped+folded block inside the kernel —
  trimmed to its ``u_rows`` nonzero input rows (the block is
  zero-padded P -> NF) — and stacks the SV axis along sublanes so the
  spectrum product and both inverse stages run as single wide
  ``[n_sv*128, 128]`` matmuls (one minor-dim block transpose between
  stages keeps both matmuls wide).  The inverse is trimmed to the
  ``q_cols`` lag columns that cover one code period.  No XLA FFT call
  remains anywhere on the acquisition fast path.

Both reduce the lag axis in VMEM to the three numbers acquisition
actually needs — peak power, peak lag and total power over the P valid
lags (the SNR statistic of reference: c/search_offline.cpp:190-197) —
writing only ``[rows, n_sv]`` scalars to HBM.  The circular wrap of the
padded linear correlation (``circ[τ] = lin[τ] + lin[τ-P]``,
tpu_gnss.acquire.folded) is folded into the code spectrum as
``1 + e^{-j2πkP/NF}`` so the kernels compute plain transforms.

Matmuls run in bfloat16 with float32 accumulation: C/A correlation
decisions (detected PRN, code phase, Doppler bin, SNR to ~1%) are far
above bf16 noise; the exact-semantics engine (acquire/search.py) remains
the golden-parity path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def complex_mm(ar, ai, br, bi):
    """Complex matmul as four real MXU matmuls, f32 accumulation.

    Deliberately the textbook 4-dot form: the 3-dot Karatsuba variant
    (m3 = (ar+ai)@(br+bi)) measured ~20% SLOWER end-to-end on v5e —
    the two dot pairs here share their RHS weight loads and pipeline
    back-to-back, while Karatsuba's extra VPU adds sit on the critical
    path between MXU issues.
    """
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return (dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br))


def split_nf(nf: int) -> tuple[int, int]:
    """Factor NF = n1 * n2 for the four-step transform.

    Prefers n2 = 128 (the TPU lane width); falls back to a near-square
    factorization.  Raises if NF is prime-ish (callers then use the XLA
    path).
    """
    if nf % 128 == 0:
        return nf // 128, 128
    r = int(np.sqrt(nf))
    while r > 1:
        if nf % r == 0:
            return nf // r, r
        r -= 1
    raise ValueError(f"NF={nf} has no usable factorization")


@functools.lru_cache(maxsize=8)
def idft_tables(nf: int) -> tuple:
    """(E1r, E1i bf16 [n1,n1], twr, twi f32 [n1,n2], E2r, E2i bf16 [n2,n2])
    numpy tables for the inverse four-step DFT."""
    n1, n2 = split_nf(nf)
    t = np.arange(n1)
    r = np.arange(n1)
    e1 = np.exp(2j * np.pi * np.outer(t, r) / n1)
    s = np.arange(n2)
    tw = np.exp(2j * np.pi * np.outer(t, s) / nf)
    q = np.arange(n2)
    e2 = np.exp(2j * np.pi * np.outer(s, q) / n2)
    return (e1.real.astype(jnp.bfloat16), e1.imag.astype(jnp.bfloat16),
            tw.real.astype(np.float32), tw.imag.astype(np.float32),
            e2.real.astype(jnp.bfloat16), e2.imag.astype(jnp.bfloat16))


def wrap_spectrum(c: np.ndarray, period: int) -> np.ndarray:
    """Fold the circular wrap of the padded linear correlation into a
    spectrum: ``C[k] * (1 + e^{-j2πkP/NF})`` (no-op when NF == P).
    Shared by both kernel code-plane builders so the wrap convention
    cannot diverge between the v1 and v2 kernels."""
    nf = c.shape[-1]
    if nf != period:
        k = np.arange(nf)
        c = c * (1.0 + np.exp(-2j * np.pi * k * (period / nf)))
    return c


def wrap_code_planes(code_ffts_p: np.ndarray, period: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Code spectra -> (real, imag) bf16 planes with the circular wrap
    folded in (:func:`wrap_spectrum`)."""
    c = wrap_spectrum(np.asarray(code_ffts_p), period)
    n_sv, nf = c.shape
    n1, n2 = split_nf(nf)
    cr = c.real.astype(jnp.bfloat16).reshape(n_sv, n1, n2)
    ci = c.imag.astype(jnp.bfloat16).reshape(n_sv, n1, n2)
    return cr, ci


def _kernel_factory(n_sv: int, n1: int, n2: int, period: int, n_acc: int):
    from jax.experimental import pallas as pl  # noqa: F401

    def kernel(g_r_ref, g_i_ref, cw_r_ref, cw_i_ref,
               e1r_ref, e1i_ref, twr_ref, twi_ref, e2r_ref, e2i_ref,
               peak_ref, lag_ref, tot_ref):
        row = pl.program_id(0)
        e1r, e1i = e1r_ref[:], e1i_ref[:]   # bf16
        e2r, e2i = e2r_ref[:], e2i_ref[:]
        twr, twi = twr_ref[:], twi_ref[:]
        # lag at cell [t, q] is n1*q + t; valid lags are < period
        ti = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
        qi = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
        lag_mat = n1 * qi + ti
        valid = lag_mat < period
        lag_f = lag_mat.astype(jnp.float32)

        mm = complex_mm                     # shared 4-dot complex matmul

        # per-SV scalars are collected into lane vectors (Mosaic cannot
        # store scalars to VMEM); lane sv holds SV sv's statistic
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        pkv = jnp.zeros((1, 128), jnp.float32)
        lgv = jnp.zeros((1, 128), jnp.int32)
        ttv = jnp.zeros((1, 128), jnp.float32)

        for sv in range(n_sv):
            cr = cw_r_ref[sv].astype(jnp.float32)
            ci = cw_i_ref[sv].astype(jnp.float32)
            pwr = jnp.zeros((n1, n2), jnp.float32)
            # non-coherent accumulation: power sums over the n_acc
            # blocks of this row before the peak search
            for b in range(n_acc):
                gr = g_r_ref[0, b]          # [n1, n2] f32
                gi = g_i_ref[0, b]
                # spectrum product M = cw[sv] * g  (f32 on the VPU)
                mr = cr * gr - ci * gi
                mi = cr * gi + ci * gr
                # four-step inverse DFT: R = (E1 @ M * tw) @ E2 (MXU)
                f1r, f1i = mm(e1r, e1i, mr.astype(jnp.bfloat16),
                              mi.astype(jnp.bfloat16))
                t_r = f1r * twr - f1i * twi
                t_i = f1r * twi + f1i * twr
                rr, ri = mm(t_r.astype(jnp.bfloat16),
                            t_i.astype(jnp.bfloat16), e2r, e2i)
                pwr = pwr + rr * rr + ri * ri
            pwr_m = jnp.where(valid, pwr, 0.0)
            pk = jnp.max(pwr_m)
            # first-max-wins lag (smallest lag among peak cells)
            lag = jnp.min(jnp.where(pwr_m >= pk, lag_f,
                                    jnp.float32(1e30)))
            pkv = jnp.where(lane == sv, pk, pkv)
            lgv = jnp.where(lane == sv, lag.astype(jnp.int32), lgv)
            ttv = jnp.where(lane == sv, jnp.sum(pwr_m), ttv)

        # outputs are full-array VMEM blocks (tiny); Mosaic's block
        # tiling rules disallow (1, n_sv) row blocks
        peak_ref[pl.ds(row, 1), :] = pkv
        lag_ref[pl.ds(row, 1), :] = lgv
        tot_ref[pl.ds(row, 1), :] = ttv

    return kernel


# ---------------------------------------------------------------------------
# v2: fully-fused kernel — forward DFT + product + inverse DFT + reduce
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def four_step_np(nf: int, period: int) -> dict:
    """Shared float64 four-step DFT factor tables (single source of truth
    for the fused kernels AND the einsum paths — keep every consumer on
    these so the index-map conventions cannot diverge).

    Index mapping (validated against np.fft): spectrum index
    ``k = k1*n2 + k2``; time index ``n = n1*u + v`` (forward input) and
    lag index ``lag = n1*q + t`` (correlation output).  Zero-padding
    makes only ``u < u_rows`` forward input rows nonzero, and only
    ``q < q_cols`` output columns carry lags inside one code period.
    ``keff`` is the signed-frequency grid (``k - NF`` for the upper
    half) in ``[k2, k1]`` layout, used by fractional-lag tap vectors.
    """
    n1, n2 = split_nf(nf)
    u_rows = min(n2, -(-period // n1))
    q_cols = min(n2, -(-period // n1))
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    v = np.arange(n1)
    u = np.arange(u_rows)
    q = np.arange(q_cols)
    t = np.arange(n1)
    k_grid = k1[None, :] * n2 + k2[:, None]                # [k2, k1]
    return dict(
        n1=n1, n2=n2, u_rows=u_rows, q_cols=q_cols,
        f2=np.exp(-2j * np.pi * np.outer(k2, u) / n2),     # [n2, u_rows]
        wt=np.exp(-2j * np.pi * np.outer(k2, v) / nf),     # [n2, n1]
        f1=np.exp(-2j * np.pi * np.outer(v, k1) / n1),     # [n1, n1]
        e1=np.exp(2j * np.pi * np.outer(k1, t) / n1),      # [n1, n1]
        tw=np.exp(2j * np.pi * np.outer(k2, t) / nf),      # [n2, n1]
        e2=np.exp(2j * np.pi * np.outer(k2, q) / n2),      # [n2, q_cols]
        keff=np.where(k_grid >= nf // 2, k_grid - nf, k_grid))


@functools.lru_cache(maxsize=8)
def fused_tables(nf: int, period: int) -> tuple:
    """Constant tables for :func:`fold_corr_reduce` (cast from
    :func:`four_step_np`; both matmul trims follow u_rows/q_cols)."""
    t = four_step_np(nf, period)
    bf = lambda a: (a.real.astype(jnp.bfloat16), a.imag.astype(jnp.bfloat16))
    f32 = lambda a: (a.real.astype(np.float32), a.imag.astype(np.float32))
    return (t["u_rows"], t["q_cols"], bf(t["f2"]), f32(t["wt"]),
            bf(t["f1"]), bf(t["e1"]), f32(t["tw"]), bf(t["e2"]))


def fold_code_planes_T(code_ffts_p: np.ndarray, period: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Wrapped code spectra in the stacked-transposed layout of
    :func:`fold_corr_reduce`: ``[n_sv*n2, n1]`` bf16 planes where row
    ``sv*n2 + k2`` column ``k1`` holds spectrum bin ``k1*n2 + k2``."""
    c = wrap_spectrum(np.asarray(code_ffts_p), period)
    n_sv, nf = c.shape
    n1, n2 = split_nf(nf)
    cT = c.reshape(n_sv, n1, n2).transpose(0, 2, 1).reshape(n_sv * n2, n1)
    return (cT.real.astype(jnp.bfloat16), cT.imag.astype(jnp.bfloat16))


def _fused_kernel_factory(n_sv: int, n1: int, n2: int, u_rows: int,
                          q_cols: int, period: int, n_acc: int):
    from jax.experimental import pallas as pl  # noqa: F401

    def kernel(x_r_ref, x_i_ref, cwT_r_ref, cwT_i_ref,
               f2r_ref, f2i_ref, wtr_ref, wti_ref, f1r_ref, f1i_ref,
               e1r_ref, e1i_ref, twr_ref, twi_ref, e2r_ref, e2i_ref,
               peak_ref, lag_ref, tot_ref):
        row = pl.program_id(0)
        f32 = jnp.float32
        bf16 = jnp.bfloat16

        mm = complex_mm                     # shared 4-dot complex matmul

        f2r, f2i = f2r_ref[:], f2i_ref[:]
        wtr, wti = wtr_ref[:], wti_ref[:]
        f1r, f1i = f1r_ref[:], f1i_ref[:]
        e1r, e1i = e1r_ref[:], e1i_ref[:]
        twr, twi = twr_ref[:], twi_ref[:]
        e2r, e2i = e2r_ref[:], e2i_ref[:]
        cr = cwT_r_ref[:].astype(f32)              # [n_sv*n2, n1]
        ci = cwT_i_ref[:].astype(f32)
        tile = lambda a: jnp.broadcast_to(
            a[None], (n_sv, n2, n1)).reshape(n_sv * n2, n1)
        twr_t, twi_t = tile(twr), tile(twi)

        pwr = jnp.zeros((n_sv * n1, q_cols), f32)
        for b in range(n_acc):
            # forward DFT of the zero-padded folded block, transposed
            # layout G^T[k2, k1]: ((F2^T @ Y^T) ⊙ W^T) @ F1
            yr = x_r_ref[0, b].astype(bf16)        # [u_rows, n1]
            yi = x_i_ref[0, b].astype(bf16)
            zr, zi = mm(f2r, f2i, yr, yi)          # [n2, n1]
            zpr = zr * wtr - zi * wti
            zpi = zr * wti + zi * wtr
            gr, gi = mm(zpr.astype(bf16), zpi.astype(bf16), f1r, f1i)
            gi = -gi                               # conj(G): correlation
            # spectrum product against every SV (stacked rows)
            grt, git = tile(gr), tile(gi)
            mr = cr * grt - ci * git               # [n_sv*n2, n1]
            mi = cr * git + ci * grt
            # inverse stage 1 (wide): A^T = M^T @ E1   [n_sv*n2, n1]
            ar_, ai_ = mm(mr.astype(bf16), mi.astype(bf16), e1r, e1i)
            br_ = ar_ * twr_t - ai_ * twi_t
            bi_ = ar_ * twi_t + ai_ * twr_t
            # per-SV block transpose, then inverse stage 2 (wide,
            # trimmed to the q_cols valid lag columns): corr = B @ E2
            btr = jnp.transpose(br_.reshape(n_sv, n2, n1),
                                (0, 2, 1)).reshape(n_sv * n1, n2)
            bti = jnp.transpose(bi_.reshape(n_sv, n2, n1),
                                (0, 2, 1)).reshape(n_sv * n1, n2)
            rr, ri = mm(btr.astype(bf16), bti.astype(bf16), e2r, e2i)
            pwr = pwr + rr * rr + ri * ri          # [n_sv*n1, q_cols]

        # reductions, vectorized over SV: lag at cell [sv, t, q] = n1*q+t
        p3 = pwr.reshape(n_sv, n1, q_cols)
        ti = jax.lax.broadcasted_iota(jnp.int32, (n_sv, n1, q_cols), 1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (n_sv, n1, q_cols), 2)
        lag_mat = n1 * qi + ti
        pm = jnp.where(lag_mat < period, p3, 0.0)
        pk = jnp.max(pm, axis=2, keepdims=True)           # [n_sv,n1,1]
        pk = jnp.max(pk, axis=1, keepdims=True)           # [n_sv,1,1]
        lag_f = jnp.where(pm >= pk, lag_mat.astype(f32), jnp.float32(1e30))
        lg = jnp.min(jnp.min(lag_f, axis=2, keepdims=True),
                     axis=1, keepdims=True)               # first max wins
        tt = jnp.sum(jnp.sum(pm, axis=2, keepdims=True),
                     axis=1, keepdims=True)

        # scatter per-SV scalars into lane vectors via a one-hot sum
        # (sublane->lane transpose without a transpose op)
        sub = jax.lax.broadcasted_iota(jnp.int32, (n_sv, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_sv, 128), 1)
        oh = (sub == lane)
        to_row = lambda v, z: jnp.sum(
            jnp.where(oh, v.reshape(n_sv, 1), z), axis=0, keepdims=True)
        peak_ref[pl.ds(row, 1), :] = to_row(pk.reshape(n_sv, 1), 0.0)
        lag_ref[pl.ds(row, 1), :] = to_row(
            lg.reshape(n_sv, 1).astype(jnp.int32), 0)
        tot_ref[pl.ds(row, 1), :] = to_row(tt.reshape(n_sv, 1), 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("period", "nf", "interpret"))
def fold_corr_reduce(x_r: jnp.ndarray, x_i: jnp.ndarray,
                     cwT_r: jnp.ndarray, cwT_i: jnp.ndarray, *,
                     period: int, nf: int, interpret: bool = False):
    """Fully-fused folded acquisition stage: forward DFT + spectrum
    product + inverse DFT + peak/SNR reduce, one Pallas kernel.

    Everything after the Doppler wipe-off/fold runs on the MXU in VMEM:
    the forward four-step DFT of each zero-padded folded block (two
    matmuls, input trimmed to its ``u_rows`` nonzero rows), the per-SV
    spectrum product (SV axis stacked along sublanes so both inverse
    stages are single wide matmuls), and the inverse four-step DFT
    trimmed to the ``q_cols`` lag columns that cover one code period —
    the SNR statistic of reference: c/search_offline.cpp:169-201 without
    ever materializing spectra or correlations in HBM.

    Args:
      x_r/x_i: ``[rows, (n_acc,) u_rows, n1]`` float32 planes of the
        wiped+folded time-domain blocks, reshaped row-major from the
        zero-padded length-``n1*u_rows`` sequence (``u_rows`` from
        :func:`fused_tables`).  With an ``n_acc`` axis the blocks'
        powers sum non-coherently before the peak search.
      cwT_r/cwT_i: planes from :func:`fold_code_planes_T`.
      period: P = fs/1000 valid lags.
      nf: transform length (NF = n1*n2, from ``fft_len_for_period``).

    Returns ``(peak [rows, n_sv] f32, lag [rows, n_sv] i32,
    tot [rows, n_sv] f32)``, scaled by NF² relative to a unitary
    inverse FFT (SNR = peak/(tot/P) is scale-free).
    """
    from jax.experimental import pallas as pl
    if x_r.ndim == 3:
        x_r = x_r[:, None]
        x_i = x_i[:, None]
    rows, n_acc, u_rows_in, n1_in = x_r.shape
    n1, n2 = split_nf(nf)
    n_sv = cwT_r.shape[0] // n2
    (u_rows, q_cols, (f2r, f2i), (wtr, wti), (f1r, f1i),
     (e1r, e1i), (twr, twi), (e2r, e2i)) = fused_tables(nf, period)
    assert (u_rows_in, n1_in) == (u_rows, n1), (
        f"x planes must be [rows, n_acc, {u_rows}, {n1}]")
    kernel = _fused_kernel_factory(n_sv, n1, n2, u_rows, q_cols, period,
                                   n_acc)

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                 jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                 jax.ShapeDtypeStruct((rows, 128), jnp.float32)]
    out_spec = pl.BlockSpec((rows, 128), lambda i: (0, 0))
    consts = [jnp.asarray(a) for a in
              (f2r, f2i, wtr, wti, f1r, f1i, e1r, e1i, twr, twi, e2r, e2i)]
    peak, lag, tot = pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=[pl.BlockSpec((1, n_acc, u_rows, n1),
                               lambda i: (i, 0, 0, 0))] * 2 +
                 [full(cwT_r), full(cwT_i)] + [full(c) for c in consts],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(x_r, x_i, cwT_r, cwT_i, *consts)
    return peak[:, :n_sv], lag[:, :n_sv], tot[:, :n_sv]


@functools.partial(jax.jit,
                   static_argnames=("period", "interpret"))
def corr_reduce(g_r: jnp.ndarray, g_i: jnp.ndarray,
                cw_r: jnp.ndarray, cw_i: jnp.ndarray, *,
                period: int, interpret: bool = False):
    """Reduced circular correlation for every (row, SV) pair.

    Args:
      g_r/g_i: ``[rows, n1, n2]`` (or ``[rows, n_acc, n1, n2]`` for
        non-coherent accumulation) float32 planes of the CONJUGATED
        wiped+folded data spectra (row = one Doppler; with an ``n_acc``
        axis, that Doppler's spectra from n_acc successive blocks whose
        |corr|² sum before the peak search), reshaped row-major from
        length-NF spectra.
      cw_r/cw_i: ``[n_sv, n1, n2]`` bf16 planes from
        :func:`wrap_code_planes` (wrap factor folded in).
      period: P = fs/1000 valid lags.

    Returns ``(peak [rows, n_sv] f32, lag [rows, n_sv] i32,
    tot [rows, n_sv] f32)`` where peak/tot are scaled by NF² relative to
    a unitary inverse FFT (SNR = peak/(tot/P) is scale-free).
    """
    from jax.experimental import pallas as pl
    if g_r.ndim == 3:
        g_r = g_r[:, None]
        g_i = g_i[:, None]
    rows, n_acc, n1, n2 = g_r.shape
    n_sv = cw_r.shape[0]
    nf = n1 * n2
    e1r, e1i, twr, twi, e2r, e2i = idft_tables(nf)
    kernel = _kernel_factory(n_sv, n1, n2, period, n_acc)

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                 jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                 jax.ShapeDtypeStruct((rows, 128), jnp.float32)]
    out_spec = pl.BlockSpec((rows, 128), lambda i: (0, 0))
    e1r_j, e1i_j = jnp.asarray(e1r), jnp.asarray(e1i)
    twr_j, twi_j = jnp.asarray(twr), jnp.asarray(twi)
    e2r_j, e2i_j = jnp.asarray(e2r), jnp.asarray(e2i)
    peak, lag, tot = pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=[pl.BlockSpec((1, n_acc, n1, n2), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, n_acc, n1, n2), lambda i: (i, 0, 0, 0)),
                  full(cw_r), full(cw_i),
                  full(e1r_j), full(e1i_j), full(twr_j), full(twi_j),
                  full(e2r_j), full(e2i_j)],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(g_r, g_i, cw_r, cw_i, e1r_j, e1i_j, twr_j, twi_j, e2r_j, e2i_j)
    return peak[:, :n_sv], lag[:, :n_sv], tot[:, :n_sv]
