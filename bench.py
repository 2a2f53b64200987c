#!/usr/bin/env python
"""Flagship benchmark: full-grid GPS C/A acquisition throughput.

Measures the complete acquisition front end on device — 1-bit quadrature
mix, forward FFT, 32-PRN x full-Doppler-grid circular correlation, SNR
peak search — in samples*PRN*Doppler-bin per second.

Baseline: the reference's published cold-search rate, ~16 Msample*PRN*bin/s
on a 1.7 GHz Pentium (2.5 s for 32 PRNs x 41 bins x 4 ms @ 10 Msps;
reference: "Homemade GPS Receiver.html":213, BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

BASELINE_SAMPLE_PRN_BIN_PER_S = 16e6


def main() -> int:
    import jax
    import jax.numpy as jnp
    from tpu_gnss.config import SYNTHETIC as cfg
    from tpu_gnss.acquire.search import Searcher

    searcher = Searcher(cfg)
    rng = np.random.default_rng(0)
    n_rot = 4  # rotate input blocks so no result caching can hide work
    blocks = [jnp.asarray(rng.integers(0, 2, cfg.fft_len, dtype=np.uint8))
              for _ in range(n_rot)]

    # warmup / compile
    res = searcher.acquire_bits(blocks[0])
    jax.block_until_ready(res)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        res = searcher.acquire_bits(blocks[i % n_rot])
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / iters

    grid = len(cfg.prns) * cfg.num_dop_bins * cfg.fft_len
    value = grid / dt
    print(json.dumps({
        "metric": "acquisition_throughput",
        "value": round(value / 1e6, 1),
        "unit": "Msample*PRN*bin/s",
        "vs_baseline": round(value / BASELINE_SAMPLE_PRN_BIN_PER_S, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
