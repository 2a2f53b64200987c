"""Fused MXU correlate-and-reduce kernel for folded acquisition.

The XLA folded engine materializes the per-(SV x Doppler) spectrum
product and its inverse FFT in HBM (~350 MB of traffic per coherent
block) because the FFT is an unfusable custom call.  This kernel removes
that round trip: for each wiped+folded data spectrum it computes, per
SV, the period-NF inverse DFT **as two matrix multiplies on the MXU**
(the classic four-step factorization NF = n1*n2)

    corr[n1*q + t] = (E1 @ M * tw) @ E2   at cell [t, q]

entirely in VMEM, then immediately reduces the lag axis to the three
numbers acquisition actually needs — peak power, peak lag and total
power over the P valid lags (the SNR statistic of
reference: c/search_offline.cpp:190-197) — writing only ``[rows, n_sv]``
scalars to HBM.  The circular wrap of the padded linear correlation
(``circ[τ] = lin[τ] + lin[τ-P]``, tpu_gnss.acquire.folded) is folded
into the code spectrum as ``1 + e^{-j2πkP/NF}`` so the kernel computes a
plain inverse transform.

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


def wrap_code_planes(code_ffts_p: np.ndarray, period: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Code spectra -> (real, imag) bf16 planes with the circular wrap
    folded in: ``C[k] * (1 + e^{-j2πkP/NF})`` (no-op when NF == P)."""
    c = np.asarray(code_ffts_p)
    n_sv, nf = c.shape
    if nf != period:
        k = np.arange(nf)
        c = c * (1.0 + np.exp(-2j * np.pi * k * (period / nf)))
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

        def mm(ar, ai, br, bi):
            """complex matmul in bf16 with f32 accumulation."""
            dot = lambda a, b: jnp.dot(a, b,
                                       preferred_element_type=jnp.float32)
            return (dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br))

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
