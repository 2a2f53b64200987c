#!/usr/bin/env python
"""Multi-device scaling harness for the sharded acquisition grid.

Measures block+Doppler-sharded acquisition throughput at increasing device
counts and reports scaling efficiency vs 1 device.  On the virtual CPU
mesh this validates the harness and the collectives; on a real multi-chip
TPU slice (none is attached to this environment — single chip only) the
same script produces the ICI scaling numbers (the >=80% @ 2 hosts target
in BASELINE.md).

Usage: python tools/bench_dist.py [--devices 1 2 4 8] [--blocks 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--blocks-per-device", type=int, default=2)
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh (8 devices)")
    args = p.parse_args()

    if args.cpu or True:  # single real chip: CPU mesh is the only option
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from tpu_gnss.config import ReceiverConfig
    from tpu_gnss.acquire import search as S
    from tpu_gnss.dist import shard

    cfg = ReceiverConfig(fs=2.048e6, fc=0.512e6, max_fo=5000.0,
                         fft_len=8192)
    searcher = S.Searcher(cfg, dop_chunk=4)
    rng = np.random.default_rng(0)
    results = []
    t1 = None
    for n_dev in args.devices:
        if n_dev > len(jax.devices()):
            continue
        blk_n = 1 if n_dev == 1 else 2
        dop_n = n_dev // blk_n
        mesh = shard.make_mesh(n_dev, axes=("blk", "dop"),
                               shape=(blk_n, dop_n))
        n_blk = args.blocks_per_device * blk_n
        bits = jnp.asarray(
            rng.integers(0, 2, (n_blk, cfg.fft_len), dtype=np.uint8))
        dops = shard.pad_dops(
            np.arange(-cfg.dop_max_bin, cfg.dop_max_bin + 1, dtype=np.int32),
            dop_n, 4)

        def run():
            return shard.acquire_blocks_sharded(
                bits, searcher.code_ffts, jnp.asarray(dops), mesh=mesh,
                lo_rate=cfg.lo_rate, lags=cfg.lags, dop_chunk=4)

        jax.block_until_ready(run())  # compile
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        work = n_blk * len(cfg.prns) * len(dops) * cfg.fft_len
        tput = work / dt
        if t1 is None:
            t1 = tput
        eff = tput / (t1 * n_dev)
        results.append(dict(devices=n_dev, blocks=n_blk,
                            gsample_prn_bin_s=round(tput / 1e9, 3),
                            efficiency_vs_1dev=round(eff, 3)))
        print(json.dumps(results[-1]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
