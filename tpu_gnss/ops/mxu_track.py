"""Fused MXU tracking correlator: wipe + DFT + E/P/L taps in one kernel.

The XLA tracking correlator materializes ``[n_chan, e_sub, NF]``
spectra, products and ramps in HBM each scan step; beyond ~12 channels
the elementwise passes over those arrays become HBM-bandwidth-bound
(measured 6x worse than linear scaling 12 -> 32 channels).  This kernel
processes one epoch per grid step with the CHANNEL axis stacked along
sublanes, so every transform stage is a single wide matmul (the same
batching that makes tpu_gnss.ops.mxu_corr.fold_corr_reduce fast):

1. carrier wipe-off: per-channel phasors from factored trig vectors,
   expanded by one complex outer product in the transposed
   ``[n_chan*n1, u_rows]`` input layout;
2. forward four-step DFT as two wide MXU matmuls (one per-channel
   block transpose between them), output ``G^T[c*k2, k1]``;
3. product with the channels' conjugated, wrap-folded code spectra
   (tpu_gnss.track.channel.code_spectra semantics);
4. prompt ramp + early/late taps.  For even ``n1`` (every standard
   sample rate) the ramp and all four tap grids are RANK-1 separable
   (:func:`tap_basis`), so this whole stage is one broadcast complex
   mult, ONE MXU matmul against the static 5-column tap basis, and
   tiny per-lane k2 reductions — profiling showed the kernel is
   VPU-op-count-bound (bf16'ing the elementwise passes changed
   nothing), and this removes the 4 full-grid tap selects + 6
   product/reduce passes that dominated that count: measured 12-ch
   7.1 ms/s vs 10.0 before (sync-overhead-cancelled timing), 64-ch
   35.7 -> 25.3 ms/s.  Odd ``n1`` keeps the dense tap-table path
   (the signed-frequency boundary cuts a column mid-way, breaking
   separability);
5. the three complex correlator sums per channel, written as six lanes.

Channels are processed in groups of <=16 inside the kernel to bound
VMEM.  Equivalent to the einsum FFT-dot path (tpu_gnss/track/channel.py)
to float32 rounding; that path remains the CPU default.  Reference
semantics: 1 ms integrate-and-dump E/P/L correlators of the FPGA channel
design ("Homemade GPS Receiver.html":287-352).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mxu_corr import complex_mm, split_nf

_GROUP = 16


def pad_channels(n_chan: int) -> int:
    """Channel padding for :func:`track_corr`: 8 when the bank fits one
    sublane group, else a whole number of 16-channel kernel groups."""
    if n_chan <= 8:
        return 8
    return -(-n_chan // _GROUP) * _GROUP


@functools.lru_cache(maxsize=8)
def track_tables(nf: int, period: int, dsamp: float) -> tuple:
    """Constant DFT tables: forward four-step factors for the kernel.

    Derived from :func:`tpu_gnss.ops.mxu_corr.four_step_np` (the single
    source of the index-map conventions), transposed for this kernel's
    chain ``G^T = ((Y^T @ F2^T) ⊙ W^T)^T_block @ F1``.  ``dsamp`` is
    kept in the signature for cache-key symmetry with the tap builders.
    The DENSE tap grids live in :func:`dense_taps` (odd-n1 path only —
    the even-n1 fast path uses the rank-1 :func:`tap_basis` and must
    not pay for four [n2, n1] complex grids it never reads).
    """
    from .mxu_corr import four_step_np
    t = four_step_np(nf, period)
    f2t = t["f2"].T                                    # [u, k2]
    wtt = t["wt"].T                                    # [v, k2]
    f1 = t["f1"]                                       # [v, k1]
    bf = lambda a: (a.real.astype(jnp.bfloat16), a.imag.astype(jnp.bfloat16))
    f32 = lambda a: (a.real.astype(np.float32), a.imag.astype(np.float32))
    return (t["u_rows"], bf(f2t), f32(wtt), bf(f1))


@functools.lru_cache(maxsize=8)
def dense_taps(nf: int, period: int, dsamp: float) -> tuple:
    """Dense early/late tap grids in the ``[k2, k1]`` layout of G^T with
    signed frequencies, ``t(d)[k2, k1] = e^{-j2πk_eff d/NF}`` — the
    odd-n1 kernel path's tables."""
    from .mxu_corr import four_step_np
    t = four_step_np(nf, period)
    tap = lambda d: np.exp(-2j * np.pi * t["keff"] * (d / nf))
    taps = (tap(dsamp), tap(dsamp - period),
            tap(-dsamp), tap(-dsamp + period))
    f32 = lambda a: (a.real.astype(np.float32), a.imag.astype(np.float32))
    return tuple(f32(x) for x in taps)


@functools.lru_cache(maxsize=8)
def tap_basis(nf: int, period: int, dsamp: float) -> tuple:
    """Rank-1 factors of the ramp/tap grids (EVEN ``n1`` only).

    Every tap grid is separable: ``t(d)[k2, k1] = u_d[k2] · v_d[k1]``
    with ``u_d[k2] = e^{-j2πk2 d/NF}`` and ``v_d[k1] = e^{-j2πk1 d/n1}
    · e^{+j2πd}[k1 >= n1/2]`` (the signed-frequency upper half is
    exactly the high k1 columns when n1 is even).  That collapses the
    kernel's per-tap elementwise passes into ONE MXU matmul with the
    basis ``B = [1, v_E, v_Ew, v_L, v_Lw]`` followed by tiny per-lane
    k2 reductions — the tap stage was the largest VPU op-count block.

    Returns ``(br, bi)`` bf16 ``[n1, 128]`` (columns 0-4 = B) and
    ``(udr, udi)`` f32 ``[n2, 128]`` (lanes 0-4 = ``[1, u_E, u_Ew,
    u_L, u_Lw]``).
    """
    n1, n2 = split_nf(nf)
    assert n1 % 2 == 0, "tap_basis is the even-n1 fast path"

    def vd(d):
        v = np.exp(-2j * np.pi * np.arange(n1) * (d / n1))
        v[n1 // 2:] *= np.exp(2j * np.pi * d)
        return v

    def ud(d):
        return np.exp(-2j * np.pi * np.arange(n2) * (d / nf))

    B = np.zeros((n1, 128), np.complex128)
    U = np.zeros((n2, 128), np.complex128)
    B[:, 0] = 1.0
    U[:, 0] = 1.0
    for j, d in enumerate((dsamp, dsamp - period, -dsamp,
                           -dsamp + period), start=1):
        B[:, j] = vd(d)
        U[:, j] = ud(d)
    return ((B.real.astype(jnp.bfloat16), B.imag.astype(jnp.bfloat16)),
            (U.real.astype(np.float32), U.imag.astype(np.float32)))


def spec_planes(code_ffts: jnp.ndarray, nf: int, n_pad: int) -> tuple:
    """Per-channel spectra -> ``[n_pad*n2, n1]`` bf16 planes (G^T layout,
    row ``c*n2 + k2`` column ``k1`` = bin ``k1*n2 + k2`` of channel c);
    channels padded to ``n_pad`` with zeros."""
    n1, n2 = split_nf(nf)
    n_chan = code_ffts.shape[0]
    t = jnp.transpose(code_ffts.reshape(n_chan, n1, n2), (0, 2, 1))
    st = t.reshape(n_chan * n2, n1)
    st = jnp.pad(st, ((0, (n_pad - n_chan) * n2), (0, 0)))
    return (jnp.real(st).astype(jnp.bfloat16),
            jnp.imag(st).astype(jnp.bfloat16))


def _kernel_factory(n_pad: int, n1: int, n2: int, u_rows: int, nf: int,
                    even: bool):
    from jax.experimental import pallas as pl  # noqa: F401
    g_sz = min(_GROUP, n_pad)
    assert n_pad % g_sz == 0, (
        f"n_pad={n_pad} must be a multiple of the channel group {g_sz} "
        "(pad channels with pad_channels())")
    n_grp = n_pad // g_sz

    def kernel(blk_r_ref, blk_i_ref, par_ref, cw_r_ref, cw_i_ref,
               f2r_ref, f2i_ref, wtr_ref, wti_ref, f1r_ref, f1i_ref,
               *tail_refs):
        out_ref = tail_refs[-1]
        if even:
            # rank-1 fast path: ramp/tap basis + static u-lane table
            br_ref, bi_ref, udr_ref, udi_ref = tail_refs[:4]
        else:
            (ter_ref, tei_ref, tewr_ref, tewi_ref,
             tlr_ref, tli_ref, tlwr_ref, tlwi_ref) = tail_refs[:8]
        f32, bf16 = jnp.float32, jnp.bfloat16
        two_pi = jnp.float32(2.0 * np.pi)

        mm = complex_mm                     # shared 4-dot complex matmul

        def outer_c(ar_, ai_, br_, bi_):
            """complex outer product of [g, A] x [g, B] -> [g*A, B]."""
            rr = (ar_[:, :, None] * br_[:, None, :]
                  - ai_[:, :, None] * bi_[:, None, :])
            ri = (ar_[:, :, None] * bi_[:, None, :]
                  + ai_[:, :, None] * br_[:, None, :])
            sh = (ar_.shape[0] * ar_.shape[1], br_.shape[1])
            return rr.reshape(sh), ri.reshape(sh)

        blk_tr = blk_r_ref[0]                  # [n1, u_rows]
        blk_ti = blk_i_ref[0]
        f2r, f2i = f2r_ref[:], f2i_ref[:]      # [u_rows, n2]
        wtr, wti = wtr_ref[:], wti_ref[:]      # [n1, n2]
        f1r, f1i = f1r_ref[:], f1i_ref[:]      # [n1, n1]
        ui = jax.lax.broadcasted_iota(jnp.int32, (1, u_rows), 1).astype(f32)
        vi = jax.lax.broadcasted_iota(jnp.int32, (1, n1), 1).astype(f32)
        k1i = jax.lax.broadcasted_iota(jnp.int32, (1, n1), 1).astype(f32)
        k2i = jax.lax.broadcasted_iota(jnp.int32, (1, n2), 1).astype(f32)
        # signed-frequency upper half is k = k1*n2 + k2 >= nf//2.  For
        # even n1 that is exactly the columns k1 >= n1//2; for odd n1
        # the boundary cuts column n1//2 at k2 = n2//2 — those cells get
        # the e^{+j2πτ} correction separately below.
        upper = (k1i > (n1 // 2)) if n1 % 2 else (k1i >= (n1 // 2))

        tile = lambda a: jnp.broadcast_to(
            a[None], (g_sz,) + a.shape).reshape(g_sz * a.shape[0],
                                                a.shape[1])
        wtr_t, wti_t = tile(wtr), tile(wti)

        for g in range(n_grp):
            par = par_ref[0, pl.ds(g * g_sz, g_sz)]    # [g_sz, 128]
            phase0 = par[:, 0:1]
            delta = par[:, 1:2]
            tau = par[:, 2:3]
            wrap_e = (par[:, 3:4] > 0.5)[:, :, None]   # [g_sz,1,1]
            wrap_l = (par[:, 4:5] > 0.5)[:, :, None]

            # --- carrier wipe, transposed layout Y^T[c*v, u] -----------
            au = -two_pi * ((phase0 + delta * (ui * n1)) % 1.0)
            av = -two_pi * ((delta * vi) % 1.0)
            cu, su = jnp.cos(au), jnp.sin(au)          # [g_sz, u_rows]
            cv, sv_ = jnp.cos(av), jnp.sin(av)         # [g_sz, n1]
            lor, loi = outer_c(cv, sv_, cu, su)        # [g_sz*n1, u_rows]
            btr = jnp.broadcast_to(blk_tr[None], (g_sz, n1, u_rows)
                                   ).reshape(g_sz * n1, u_rows)
            bti = jnp.broadcast_to(blk_ti[None], (g_sz, n1, u_rows)
                                   ).reshape(g_sz * n1, u_rows)
            yr = (btr * lor - bti * loi).astype(bf16)
            yi = (btr * loi + bti * lor).astype(bf16)

            # --- forward DFT: stage A wide, block transpose, stage C ---
            zr, zi = mm(yr, yi, f2r, f2i)              # [g*n1, n2]
            zpr = zr * wtr_t - zi * wti_t
            zpi = zr * wti_t + zi * wtr_t
            tr_ = jnp.transpose(zpr.reshape(g_sz, n1, n2),
                                (0, 2, 1)).reshape(g_sz * n2, n1)
            ti_ = jnp.transpose(zpi.reshape(g_sz, n1, n2),
                                (0, 2, 1)).reshape(g_sz * n2, n1)
            gr, gi = mm(tr_.astype(bf16), ti_.astype(bf16), f1r, f1i)
            # no conj here: code_spectra() already bakes conj(FFT(code))
            # into the spectra (the FFT-dot convention)

            # --- product with code spectra [g*k2, k1] ------------------
            cr = cw_r_ref[pl.ds(g * g_sz * n2, g_sz * n2)].astype(f32)
            ci = cw_i_ref[pl.ds(g * g_sz * n2, g_sz * n2)].astype(f32)
            pr = cr * gr - ci * gi
            pi_ = cr * gi + ci * gr

            # --- prompt ramp, factored per channel ---------------------
            a1 = -two_pi * ((k1i * (tau / n1)) % 1.0) + jnp.where(
                upper, two_pi * (tau % 1.0), 0.0)      # [g_sz, n1]
            a2 = -two_pi * ((k2i * (tau / nf)) % 1.0)  # [g_sz, n2]
            c1, s1 = jnp.cos(a1), jnp.sin(a1)
            c2, s2 = jnp.cos(a2), jnp.sin(a2)

            if even:
                # --- rank-1 tap stage: the ramp and every E/L tap grid
                # factor as u[k2]·v[k1] (tap_basis), so the whole
                # per-tap elementwise+reduce pipeline collapses into
                # (a) one broadcast complex mult by v_tau, (b) ONE MXU
                # matmul with the static basis B = [1, v_E, v_Ew, v_L,
                # v_Lw], and (c) small k2 reductions — removing the
                # 4 tap-table selects and 6 full-grid product passes
                # that dominated the kernel's VPU op count.
                inv_nf = jnp.float32(1.0 / nf)
                p3r = pr.reshape(g_sz, n2, n1)
                p3i = pi_.reshape(g_sz, n2, n1)
                vr_, vi_ = c1[:, None, :], s1[:, None, :]
                qar = (p3r * vr_ - p3i * vi_).reshape(
                    g_sz * n2, n1).astype(bf16)
                qai = (p3r * vi_ + p3i * vr_).reshape(
                    g_sz * n2, n1).astype(bf16)
                qr, qi = mm(qar, qai, br_ref[:], bi_ref[:])  # [g*n2,128]
                q3r = qr.reshape(g_sz, n2, 128)
                q3i = qi.reshape(g_sz, n2, 128)
                ur2, ui2 = c2[:, :, None], s2[:, :, None]    # u_tau
                zr_ = q3r * ur2 - q3i * ui2
                zi_ = q3r * ui2 + q3i * ur2
                udr, udi = udr_ref[:][None], udi_ref[:][None]
                hr = zr_ * udr - zi_ * udi
                hi = zr_ * udi + zi_ * udr
                red = hr.sum(axis=1) * inv_nf                # [g_sz, 128]
                imd = hi.sum(axis=1) * inv_nf
                we = par[:, 3:4]
                wl = par[:, 4:5]
                pick = lambda m, j, w_: ((1.0 - w_) * m[:, j:j + 1]
                                         + w_ * m[:, j + 1:j + 2])
                vals = (red[:, 0:1], imd[:, 0:1],
                        pick(red, 1, we), pick(imd, 1, we),
                        pick(red, 3, wl), pick(imd, 3, wl))
                lane = jax.lax.broadcasted_iota(jnp.int32, (g_sz, 128), 1)
                out = jnp.zeros((g_sz, 128), f32)
                for j, vv in enumerate(vals):
                    out = jnp.where(lane == j, vv, out)
                out_ref[0, pl.ds(g * g_sz, g_sz), :] = out
                continue

            rmr, rmi = outer_c(c2, s2, c1, s1)         # [g_sz*n2, n1]
            if n1 % 2:
                # odd n1: apply the upper-half phasor to the cells of
                # boundary column k1 = n1//2 with k2 >= n2//2
                at = two_pi * (tau % 1.0)              # [g_sz, 1]
                ur = jnp.broadcast_to(jnp.cos(at)[:, :, None],
                                      (g_sz, n2, 1)).reshape(g_sz * n2, 1)
                ui_ = jnp.broadcast_to(jnp.sin(at)[:, :, None],
                                       (g_sz, n2, 1)).reshape(g_sz * n2, 1)
                col = jax.lax.broadcasted_iota(jnp.int32, (g_sz, n2, n1), 2)
                rowk = jax.lax.broadcasted_iota(jnp.int32, (g_sz, n2, n1), 1)
                bnd = ((col == n1 // 2) & (rowk >= n2 // 2)).reshape(
                    g_sz * n2, n1)
                rmr, rmi = (jnp.where(bnd, rmr * ur - rmi * ui_, rmr),
                            jnp.where(bnd, rmr * ui_ + rmi * ur, rmi))
            wr = pr * rmr - pi_ * rmi
            wi = pr * rmi + pi_ * rmr

            inv_nf = jnp.float32(1.0 / nf)
            red3 = lambda x: jnp.sum(jnp.sum(
                x.reshape(g_sz, n2, n1), axis=2, keepdims=True),
                axis=1, keepdims=True).reshape(g_sz, 1) * inv_nf
            sel = lambda wrap, t1, t2: jnp.where(
                wrap, jnp.broadcast_to(t2[None], (g_sz, n2, n1)),
                jnp.broadcast_to(t1[None], (g_sz, n2, n1))).reshape(
                g_sz * n2, n1)
            ter = sel(wrap_e, ter_ref[:], tewr_ref[:])
            tei = sel(wrap_e, tei_ref[:], tewi_ref[:])
            tlr = sel(wrap_l, tlr_ref[:], tlwr_ref[:])
            tli = sel(wrap_l, tli_ref[:], tlwi_ref[:])
            vals = (red3(wr), red3(wi),
                    red3(wr * ter - wi * tei), red3(wr * tei + wi * ter),
                    red3(wr * tlr - wi * tli), red3(wr * tli + wi * tlr))

            lane = jax.lax.broadcasted_iota(jnp.int32, (g_sz, 128), 1)
            out = jnp.zeros((g_sz, 128), f32)
            for j, vv in enumerate(vals):
                out = jnp.where(lane == j, vv, out)
            out_ref[0, pl.ds(g * g_sz, g_sz), :] = out

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("period", "nf", "dsamp", "interpret"))
def track_corr(blk_tr: jnp.ndarray, blk_ti: jnp.ndarray,
               params: jnp.ndarray, cw_r: jnp.ndarray, cw_i: jnp.ndarray,
               *, period: int, nf: int, dsamp: float = 0.0,
               interpret: bool = False):
    """E/P/L correlators for every (epoch, channel), fully fused.

    Args:
      blk_tr/blk_ti: ``[e_sub, n1, u_rows]`` float32 planes of the
        step's 1 ms epochs, zero-padded P -> u_rows*n1 and TRANSPOSED
        from the row-major ``[u_rows, n1]`` layout (u_rows from
        :func:`track_tables`).
      params: ``[e_sub, n_pad, 128]`` float32 (n_pad a multiple of 8);
        per (epoch, channel) lanes [phase0 (cycles), delta
        (cycles/sample), tau (samples, prompt lag in [0, P)), wrap_e,
        wrap_l].
      cw_r/cw_i: planes from :func:`spec_planes` (conj + circular wrap
        folded in, as produced by track.channel.code_spectra).
      dsamp: early/late tap offset in samples (static).

    Returns ``[e_sub, n_pad, 6]`` float32: (cp, ce, cl) re/im pairs,
    scaled like the einsum FFT-dot path (sum / NF).
    """
    from jax.experimental import pallas as pl
    n1, n2 = split_nf(nf)
    (u_rows, (f2r, f2i), (wtr, wti),
     (f1r, f1i)) = track_tables(nf, period, dsamp)
    e_sub, n_pad = params.shape[0], params.shape[1]
    even = n1 % 2 == 0
    kernel = _kernel_factory(n_pad, n1, n2, u_rows, nf, even)

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    if even:
        # rank-1 fast path (tap_basis): basis matmul + u-lane table
        # replace the four full tap grids
        (br, bi), (udr, udi) = tap_basis(nf, period, dsamp)
        tap_consts = (br, bi, udr, udi)
    else:
        ((ter, tei), (tewr, tewi), (tlr, tli),
         (tlwr, tlwi)) = dense_taps(nf, period, dsamp)
        tap_consts = (ter, tei, tewr, tewi, tlr, tli, tlwr, tlwi)
    consts = [jnp.asarray(a) for a in
              (f2r, f2i, wtr, wti, f1r, f1i) + tap_consts]
    out = pl.pallas_call(
        kernel,
        grid=(e_sub,),
        in_specs=[pl.BlockSpec((1, n1, u_rows), lambda i: (i, 0, 0))] * 2 +
                 [pl.BlockSpec((1, n_pad, 128), lambda i: (i, 0, 0))] +
                 [full(cw_r), full(cw_i)] +
                 [full(c) for c in consts],
        out_specs=pl.BlockSpec((1, n_pad, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((e_sub, n_pad, 128), jnp.float32),
        interpret=interpret,
    )(blk_tr, blk_ti, params, cw_r, cw_i, *consts)
    return out[:, :, :6]
