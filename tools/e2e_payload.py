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
from tpu_gnss.pvt import solve as ps
from tpu_gnss.utils import metrics
import tests.test_e2e as E

t0 = time.perf_counter()
import tests.test_pvt  # noqa: F401  (make_constellation import side)
rng = np.random.default_rng(42)
ephs = E.make_constellation(6, t_oe=E.T_OE)
rx = ps.geodetic_to_ecef(*E.TRUTH_LLA)
duration = 20.0
n = int(duration * E.FS)
t_knots = np.linspace(0, duration, 41)
t_rx0 = E.T_OE + 88.6
iq = np.zeros(n, dtype=np.complex64)
from tpu_gnss.nav.ephemeris import encode_subframes
from tpu_gnss.signal import synth
for k, eph in enumerate(ephs):
    tsv_k = E.sv_time_knots(eph, rx, t_rx0 + t_knots)
    poly = np.polynomial.Polynomial.fit(t_knots, tsv_k, deg=3)
    t = np.arange(n, dtype=np.float64) / E.FS
    tsv = poly(t)
    sf0 = 6.0 * np.floor(tsv[0] / 6.0)
    tow0 = int(sf0 / 6.0) + 1
    frames = encode_subframes(eph, tow_start=tow0, sids=(4, 1, 2, 3))
    stream = np.concatenate(frames)
    iq += synth.synth_from_sv_time(E.eph_prn(k), tsv, stream, sf0, E.FS,
                                   amplitude=1.0)
iq += (0.7 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
       / np.sqrt(2)).astype(np.complex64)
print(f"scene synth: {time.perf_counter()-t0:.1f}s "
      f"({duration:.0f}s of 6-SV baseband at {E.FS/1e6:.3f} Msps)",
      flush=True)

cfg = ReceiverConfig(fs=E.FS, fc=0.0, max_fo=5000.0, num_chans=12)
recv = Receiver(cfg)
t0 = time.perf_counter()
res = recv.process_iq(iq)
wall = time.perf_counter() - t0
print(f"receiver: {wall:.1f}s wall for {duration:.0f}s of capture "
      f"({duration/wall:.2f}x realtime)", flush=True)
print(f"detections: {[(d['prn'], round(d['snr'])) for d in res.detections]}")
print(f"solutions: {len(res.solutions)}")
if res.solutions:
    s = res.solutions[-1]
    err = np.linalg.norm(np.array([s.x, s.y, s.z]) - rx)
    print(f"final fix error: {err:.1f} m  "
          f"(lat {s.lat_deg:.5f} lon {s.lon_deg:.5f} alt {s.alt_m:.0f})")
print(metrics.METRICS.report())
print("PAYLOAD_DONE")
