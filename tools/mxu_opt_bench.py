"""Microbenchmark: split the folded-MXU acquisition step into its
prologue (wipe/fold, XLA) and the fused DFT-correlate-reduce kernel to
see where the time goes.  TPU-only scratch tool.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from tpu_gnss.config import SYNTHETIC as cfg
from tpu_gnss.acquire import folded as F
from tpu_gnss.ops.mxu_corr import fold_corr_reduce, fused_tables, split_nf


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    searcher = F.FoldedSearcher(cfg, n_coherent=4)
    rng = np.random.default_rng(0)
    n_blocks = 8
    bits = jnp.asarray(rng.integers(
        0, 2, (n_blocks, searcher.block_len), dtype=np.uint8))
    period, nf = searcher.period, searcher.nf
    n1, n2 = split_nf(nf)
    u_rows, q_cols = fused_tables(nf, period)[:2]
    cw_r, cw_i = searcher.mxu_code_planes()
    dops = searcher.dops_hz
    n_dop = len(dops)
    print(f"period={period} nf={nf} n1={n1} n2={n2} u_rows={u_rows} "
          f"q_cols={q_cols} n_dop={n_dop} blocks={n_blocks} "
          f"dop_chunk={searcher.dop_chunk}")

    # ---- full step (as bench.py measures) ----
    @jax.jit
    def full(bits):
        return F.acquire_folded_batch_mxu(
            bits, cw_r, cw_i, dops, fs=cfg.fs, lo_rate=cfg.lo_rate,
            n_coherent=searcher.n_coherent, dop_chunk=searcher.dop_chunk,
            from_bits=True, period=period, nf=nf).snr

    t_full = timeit(full, bits)

    # ---- prologue only: mix + wipe/fold for the whole chunk grid ----
    @jax.jit
    def prologue(bits):
        iq = F.mix_baseband(bits, cfg.lo_rate)
        fold = F._fold_maker(iq, fs=cfg.fs, n_coherent=searcher.n_coherent,
                             period=period, dop_chunk=searcher.dop_chunk)
        pad = (-n_dop) % searcher.dop_chunk
        dops_p = jnp.concatenate([dops, jnp.zeros(pad, dops.dtype)])
        chunks = dops_p.reshape(-1, searcher.dop_chunk)
        x = jax.lax.map(fold, chunks)
        return jnp.sum(jnp.real(x)) + jnp.sum(jnp.imag(x))

    t_pro = timeit(prologue, bits)

    # ---- kernel only on pre-made folded planes ----
    rows = n_blocks * searcher.dop_chunk
    x_r = jnp.asarray(rng.standard_normal((rows, u_rows, n1), np.float32))
    x_i = jnp.asarray(rng.standard_normal((rows, u_rows, n1), np.float32))

    @jax.jit
    def kernel(x_r, x_i):
        return fold_corr_reduce(x_r, x_i, cw_r, cw_i, period=period,
                                nf=nf)[0]

    t_ker = timeit(kernel, x_r, x_i)

    n_sv = cw_r.shape[0] // n2
    # MXU real-FLOP per row: forward (2 stages) + stage1 + stage2
    cmacs = (n2 * u_rows * n1 + n2 * n1 * n1
             + n_sv * n2 * n1 * n1 + n_sv * n1 * n2 * q_cols)
    flop = rows * cmacs * 8
    thr = n_blocks * len(dops) * n_sv * searcher.block_len / t_full
    print(f"full step : {t_full*1e3:8.2f} ms  "
          f"({thr/1e9:.1f} Gsample*prn*bin/s)")
    print(f"prologue  : {t_pro*1e3:8.2f} ms")
    print(f"kernel    : {t_ker*1e3:8.2f} ms  ({rows} rows, "
          f"{flop/t_ker/1e12:.1f} TFLOP/s MXU)")


if __name__ == "__main__":
    main()
