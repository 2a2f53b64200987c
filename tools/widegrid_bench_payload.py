"""Wide-Doppler (+/-100 kHz) acquisition throughput -> BENCH_widegrid.json.

Replay captures need +/-100 kHz Doppler grids because of TX/RX oscillator
offsets (reference README.md section 2.1e: gps_test ... 0.62e6 2.8e6
100000); the grid is ~28x the live +/-5 kHz one.  Same measurement
methodology as bench.py (chained lax.scan-free steps with a
data-dependent carry so the lazy tunneled backend really executes
every rep), on the fused MXU engine.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("alive:", np.asarray(jnp.arange(2) + 1), flush=True)

from tpu_gnss.config import ReceiverConfig
from tpu_gnss.acquire import folded as F

BASELINE_SAMPLE_PRN_BIN_PER_S = 16e6   # reference CPU rate (BASELINE.md)

cfg = ReceiverConfig(fs=8.184e6, fc=2.046e6, max_fo=100000.0)
searcher = F.FoldedSearcher(cfg, n_coherent=4)
rng = np.random.default_rng(0)
n_blocks = 8     # 8 blocks x 2857 bins ~ the same grid volume as bench.py

bits_blocks = jnp.asarray(
    rng.integers(0, 2, (n_blocks, searcher.block_len), dtype=np.uint8))
period, nf = searcher.period, searcher.nf
cw_r, cw_i = searcher.mxu_code_planes()
n_dop = len(searcher.dops_hz)
print(f"grid: {len(cfg.prns)} PRN x {n_dop} bins x {searcher.block_len} "
      f"samples, dop_chunk={searcher.dop_chunk}", flush=True)


@jax.jit
def step(blocks, carry, cw_r, cw_i, dops_hz):
    res = F.acquire_folded_batch_mxu(
        blocks ^ carry, cw_r, cw_i, dops_hz, fs=cfg.fs,
        lo_rate=cfg.lo_rate, n_coherent=searcher.n_coherent,
        dop_chunk=searcher.dop_chunk, from_bits=True, period=period, nf=nf)
    return (res.ca_shift[0, 0] & 1).astype(jnp.uint8), res.snr


carry, out = step(bits_blocks, jnp.uint8(0), cw_r, cw_i, searcher.dops_hz)
_ = np.asarray(out)   # compile + first execution

# sync-cancelled timing (r5, as bench.py): the final fetch costs a flat
# ~23 ms on this backend — difference two run lengths so it cancels
def timed(reps):
    global carry
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            carry, out = step(bits_blocks, carry, cw_r, cw_i,
                              searcher.dops_hz)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


t_lo, t_hi = timed(2), timed(6)
dt = (t_hi - t_lo) / (4 * n_blocks)

grid = len(cfg.prns) * n_dop * searcher.block_len
value = grid / dt
artifact = dict(metric="acquisition_throughput_widegrid",
                value=round(value / 1e6, 1), unit="Msample*PRN*bin/s",
                vs_baseline=round(value / BASELINE_SAMPLE_PRN_BIN_PER_S, 1),
                n_doppler_bins=int(n_dop), max_fo_hz=cfg.max_fo,
                fs_hz=cfg.fs, block_len=int(searcher.block_len))
out_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_widegrid.json")
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=1)
print(json.dumps(artifact))
print("PAYLOAD_DONE", flush=True)
