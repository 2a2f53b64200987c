"""The /verify canonical drive as a retry-friendly payload.

Acquires the checked-in PRN-8 golden capture on the real chip and
asserts the golden expectations (PRN 8 dominant, snr~560, lo_shift=0,
ca_shift~8164), plus the noise-rejection probe.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from tpu_gnss.config import PRESETS
from tpu_gnss.io import loaders
from tpu_gnss.acquire.search import Searcher

cfg = PRESETS["synthetic"]
bits = loaders.load_1bit("/root/reference/gps_sig_tmp.bin",
                         count=cfg.fft_len)
s = Searcher(cfg)
dets = s.detections(s.acquire_bits(bits))
print(dets, flush=True)
best = max(dets, key=lambda d: d["snr"])
assert best["prn"] == 8 and best["snr"] > 400, best
assert best["lo_shift"] == 0 and abs(best["ca_shift"] - 8164) < 8, best

rng = np.random.default_rng(3)
noise = rng.integers(0, 2, cfg.fft_len, dtype=np.uint8)
nd = s.detections(s.acquire_bits(noise))
print("noise detections:", nd, flush=True)
assert not nd, nd
print("PAYLOAD_DONE", flush=True)
