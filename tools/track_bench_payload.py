"""Tracking-bank throughput on real hardware -> BENCH_track.json.

Measures the fused MXU tracking correlator (tpu_gnss/ops/mxu_track.py)
at the reference's 12 channels and beyond (the reference is capped at 12
by Spartan-3 fabric, "Homemade GPS Receiver.html":57,95; one FPGA = 1x
realtime), and the portable XLA fft-dot path for comparison.  Writes a
machine-readable artifact so a tracking-kernel regression is
driver-visible (VERDICT r1 weak #4).
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

from tpu_gnss.track import channel as tc
from tpu_gnss.signal import synth
from tpu_gnss.utils.xfer import to_device_complex

FS = 5.456e6
E = 10                       # epochs per scan step (10 ms)
ALL_PRNS = list(range(1, 33))


def bench_bank(n_chan: int, use_pallas) -> dict:
    prns = [ALL_PRNS[i % 32] for i in range(n_chan)]
    # synthesize 12 distinct SVs and reuse the mixture for bigger banks:
    # correlator cost does not depend on how many SVs are really present
    svs = [synth.SvSignal(prn=p, doppler_hz=250.0 * i - 1500.0,
                          code_phase_chips=80.0 * i)
           for i, p in enumerate(prns[:12])]
    iq = synth.synth_baseband(svs, FS, 1000 * 5456, noise_std=0.5, seed=7)
    iq_d = to_device_complex(iq)
    state0 = tc.init_state(n_chan)
    for ch, p in enumerate(prns):
        state0 = tc.start_channel(state0, ch, 250.0 * (ch % 12) - 1500.0,
                                  80.0 * (ch % 12))
    tables = jnp.asarray(tc.channel_code_tables(prns, n_chan))
    spec, _nf = tc.code_spectra(prns, n_chan, FS)
    g1 = tc.second_order_gains(18.0, t_s=E * 1e-3)
    g2 = tc.second_order_gains(2.0, t_s=E * 1e-3)

    def run(st):
        return tc.track_epochs(iq_d, st, tables, fs=FS, pll_gains=g1,
                               dll_gains=g2, epochs_per_step=E,
                               code_ffts=spec, use_pallas=use_pallas)

    st, out = run(state0)
    _ = np.asarray(out.ip[-1])   # compile + settle
    # Timing methodology (r5): the tunneled backend's block_until_ready
    # costs a FLAT ~23 ms regardless of preceding work, which inflated
    # the old 5-iteration averages by ~4.6 ms/s (the published 12-ch
    # 60.6x was really ~100x).  Difference two run lengths so the sync
    # cost cancels exactly: per-second cost = (T(25) - T(5)) / 20.
    # NOTE: fetch only small slices around timing; pulling full
    # histories across the tunnel slows subsequent runs ~10x.
    def timed(iters):
        nonlocal st
        best = float("inf")
        for _ in range(3):       # best of 3: amortize tunnel RTT jitter
            t0 = time.perf_counter()
            ss = st
            for _ in range(iters):
                ss, out2 = run(ss)
            jax.block_until_ready(out2.ip)
            best = min(best, time.perf_counter() - t0)
        st = ss
        return best, out2

    t5, _ = timed(5)
    t25, out = timed(25)
    dt = (t25 - t5) / 20.0
    lock = float(np.abs(np.asarray(out.ip[-50:, 0])).mean())
    rt = 1.0 / dt                # each run tracks 1 s of samples
    print(f"n_chan={n_chan:3d} pallas={use_pallas}: {dt*1e3:6.1f} ms/s "
          f"-> {rt:6.1f}x realtime  lock|ip|~{lock:.0f} "
          f"(T5={t5*1e3:.0f}ms T25={t25*1e3:.0f}ms)", flush=True)
    return dict(n_chan=n_chan, pallas=bool(use_pallas),
                realtime_factor=round(rt, 1), ms_per_s=round(dt * 1e3, 1),
                lock_ip=round(lock), t5_ms=round(t5 * 1e3),
                t25_ms=round(t25 * 1e3))


sweep = [bench_bank(n, True) for n in (12, 32, 64)]
sweep.append(bench_bank(12, False))       # portable XLA path
main = sweep[0]
artifact = dict(metric="tracking_realtime_factor",
                value=main["realtime_factor"], unit="x_realtime",
                vs_baseline=main["realtime_factor"],   # reference FPGA = 1x
                n_chan=12, fs_hz=FS, epochs_per_step=E, sweep=sweep,
                methodology="per-second cost = (T(25 runs) - T(5 runs))"
                            " / 20: cancels the backend's flat ~23 ms"
                            " block_until_ready sync cost that inflated"
                            " earlier 5-run averages by ~4.6 ms/s",
                binding_stage="in-kernel VPU elementwise op count"
                              " (NOT HBM/VMEM bandwidth: bf16 halving"
                              " measured ~5% slower; NOT scan overhead:"
                              " epochs_per_step sweep flat).  Scaling"
                              " is affine: ~4 ms/s fixed + ~0.35 ms/s"
                              " per channel after the rank-1 tap-basis"
                              " restructure (ops/mxu_track.tap_basis)")
out_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_track.json")
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=1)
print(json.dumps(artifact))
print("PAYLOAD_DONE", flush=True)
