#!/usr/bin/env python
"""Flagship benchmark: full-grid GPS C/A acquisition throughput.

Measures the complete acquisition front end on device — 1-bit quadrature
mix, Doppler wipe-off + coherent fold, forward FFT, 32-PRN circular
correlation via the fused MXU kernel (four-step IDFT as two matmuls +
in-VMEM peak/SNR reduction, tpu_gnss/ops/mxu_corr.py), SNR peak search —
in samples*PRN*Doppler-bin per second.

Baseline: the reference's published cold-search rate, ~16 Msample*PRN*bin/s
on a 1.7 GHz Pentium (2.5 s for 32 PRNs x 41 bins x 4 ms @ 10 Msps;
reference: "Homemade GPS Receiver.html":213, BASELINE.md).

Measurement notes: the tunneled TPU backend is lazy (block_until_ready does
not force execution), so the benchmark chains blocks through a lax.scan
with a data-dependent carry inside ONE jit and fetches the final result —
every block must really execute, sequentially, on device.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

BASELINE_SAMPLE_PRN_BIN_PER_S = 16e6


def main() -> int:
    import os
    import jax
    import jax.numpy as jnp
    # persistent compile cache: repeat runs skip the (slow, occasionally
    # flaky) remote compile on the tunneled TPU backend
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from tpu_gnss.config import SYNTHETIC as cfg
    from tpu_gnss.acquire import folded as F

    searcher = F.FoldedSearcher(cfg, n_coherent=4)
    rng = np.random.default_rng(0)
    # Big batch + many chained reps: the tunneled backend costs ~25 ms
    # per host fetch round-trip regardless of work, so the measurement
    # amortizes it over reps*n_blocks blocks of real device compute.
    n_blocks = 64

    bits_blocks = jnp.asarray(
        rng.integers(0, 2, (n_blocks, searcher.block_len), dtype=np.uint8))
    period = searcher.period
    nf = searcher.nf
    cw_r, cw_i = searcher.mxu_code_planes()

    @jax.jit
    def step(blocks, carry, cw_r, cw_i, dops_hz):
        # data-dependent carry chains reps so the (lazy) backend must
        # really execute every rep sequentially
        res = F.acquire_folded_batch_mxu(
            blocks ^ carry, cw_r, cw_i, dops_hz, fs=cfg.fs,
            lo_rate=cfg.lo_rate, n_coherent=searcher.n_coherent,
            dop_chunk=searcher.dop_chunk, from_bits=True, period=period,
            nf=nf)
        return (res.ca_shift[0, 0] & 1).astype(jnp.uint8), res.snr

    carry, out = step(bits_blocks, jnp.uint8(0), cw_r, cw_i,
                      searcher.dops_hz)
    _ = np.asarray(out)  # force compile + first execution

    # Sync-cancelled timing (r5): the final fetch/sync costs a FLAT
    # ~23 ms on this backend regardless of preceding work — ~11% of a
    # 10-rep run at current speed.  Difference two run lengths so it
    # cancels exactly; best of 3 trials each (the tunnel's round-trip
    # share varies run to run; the fastest trial is the cleanest view
    # of device throughput).
    def timed(reps):
        nonlocal carry
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                carry, out = step(bits_blocks, carry, cw_r, cw_i,
                                  searcher.dops_hz)
            _ = np.asarray(out)  # force the whole chain
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(3), timed(13)
    dt = (t_hi - t_lo) / (10 * n_blocks)

    grid = len(cfg.prns) * len(searcher.dops_hz) * searcher.block_len
    value = grid / dt
    print(json.dumps({
        "metric": "acquisition_throughput",
        "value": round(value / 1e6, 1),
        "unit": "Msample*PRN*bin/s",
        "vs_baseline": round(value / BASELINE_SAMPLE_PRN_BIN_PER_S, 1),
    }))
    return 0


def _run_with_retries() -> int:
    """Run the measurement in child processes with timeout + retry.

    The tunneled TPU backend occasionally wedges (a killed process can
    leave the relay unusable for ~a minute); a hung run would otherwise
    leave no benchmark line at all.
    """
    import subprocess
    import time as _time
    n_tries = 10
    for attempt in range(n_tries):
        try:
            out = subprocess.run(
                [sys.executable, "-u", __file__, "--inner"],
                capture_output=True, text=True, timeout=280)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
                    return 0
        except subprocess.TimeoutExpired:
            pass
        if attempt < n_tries - 1:
            # tunnel outages have been observed to last tens of minutes;
            # total patience here is ~1 h
            _time.sleep(120)
    print(json.dumps({"metric": "acquisition_throughput", "value": 0,
                      "unit": "Msample*PRN*bin/s", "vs_baseline": 0,
                      "error": "device unavailable after retries"}))
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        sys.exit(main())
    sys.exit(_run_with_retries())
