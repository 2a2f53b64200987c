"""Full-chain TPU demo: 20 s consistent 6-SV scene -> position fix.

Reuses the e2e test's scene builder (light-time-exact code phases,
parity-valid NAV, Doppler-coherent carriers) and runs the COMPLETE
pipeline on the real TPU, reporting wall-clock per stage and the final
position error vs the synthesized truth.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np

from tpu_gnss.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()

from tpu_gnss.config import ReceiverConfig
from tpu_gnss.receiver import Receiver
from tpu_gnss.utils import metrics
import tests.test_e2e as E

t0 = time.perf_counter()
iq, ephs, rx = E.build_scene()
duration = len(iq) / E.FS
print(f"scene synth: {time.perf_counter()-t0:.1f}s "
      f"({duration:.0f}s of 6-SV baseband at {E.FS/1e6:.3f} Msps)",
      flush=True)

cfg = ReceiverConfig(fs=E.FS, fc=E.FS / 4, max_fo=5000.0, fft_len=4096,
                     snr_threshold=20.0, num_chans=12)

# run twice: the first pass populates the persistent compile cache (and
# in-process jit caches); the second measures steady-state — the number
# that matters for a long-running receiver
walls = []
for attempt in range(2):
    recv = Receiver(cfg)
    metrics.METRICS.timings.clear()
    metrics.METRICS.counters.clear()
    t0 = time.perf_counter()
    res = recv.process_iq(iq, max_channels=8)
    walls.append(time.perf_counter() - t0)
    print(f"pass {attempt}: {walls[-1]:.1f}s wall for {duration:.0f}s of "
          f"capture ({duration/walls[-1]:.2f}x realtime)", flush=True)

wall = walls[-1]
print(f"detections: {[(d['prn'], round(d['snr'])) for d in res.detections]}")
print(f"solutions: {len(res.solutions)}")
err = None
if res.solutions:
    s = res.solutions[-1]
    err = float(np.linalg.norm(np.array([s.x, s.y, s.z]) - rx))
    print(f"final fix error: {err:.1f} m  "
          f"(lat {s.lat_deg:.5f} lon {s.lon_deg:.5f} alt {s.alt_m:.0f})")
print(metrics.METRICS.report())

import json
artifact = dict(metric="e2e_realtime_factor",
                value=round(duration / wall, 2), unit="x_realtime",
                wall_s=round(wall, 2), capture_s=duration,
                cold_wall_s=round(walls[0], 2),
                n_solutions=len(res.solutions),
                final_fix_error_m=round(err, 1) if err is not None else None,
                stages={k: round(sum(v), 3)
                        for k, v in metrics.METRICS.timings.items()})
out_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_e2e.json")
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=1)
print(json.dumps(artifact))
print("PAYLOAD_DONE")
