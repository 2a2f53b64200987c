"""Diagnostic: time each piece of the full-chain pipeline in isolation.

Pinpoints where e2e wall time goes on the tunneled backend: upload
bandwidth, acquisition compile/steady, tracking compile/steady, drain
fetch.  Temporary instrumentation tool.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np

from tpu_gnss.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

t0 = time.perf_counter()
print("alive:", np.asarray(jnp.arange(2) + 1),
      f"({time.perf_counter()-t0:.1f}s)", flush=True)

FS = 2.048e6
from tpu_gnss.config import ReceiverConfig
from tpu_gnss.utils.xfer import to_device_complex_i8
from tpu_gnss.receiver import Receiver
from tpu_gnss.track import channel as tc

cfg = ReceiverConfig(fs=FS, fc=FS / 4, max_fo=5000.0, fft_len=4096,
                     snr_threshold=20.0, num_chans=12)
rng = np.random.default_rng(0)
chunk = (rng.standard_normal(int(2 * FS))
         + 1j * rng.standard_normal(int(2 * FS))).astype(np.complex64)

# 1. upload bandwidth (int8 planes, 2 s chunk = 8.2 MB)
for i in range(3):
    t0 = time.perf_counter()
    dev = to_device_complex_i8(chunk, 10.0)
    _ = np.asarray(jnp.sum(jnp.abs(dev)))     # force
    dt = time.perf_counter() - t0
    print(f"upload {2*len(chunk)/1e6:.1f} MB int8 + reduce: {dt:.2f}s "
          f"({2*len(chunk)/1e6/dt:.1f} MB/s)", flush=True)

# 2. cold acquisition (the receiver's engine dispatch, 4-block head)
recv = Receiver(cfg)
head = chunk[: recv.weak_noncoherent * recv.searcher.block_len]
for i in range(2):
    t0 = time.perf_counter()
    dets = recv._cold_detections(head)
    print(f"cold acquisition pass {i}: {time.perf_counter()-t0:.1f}s "
          f"({len(dets)} hits)", flush=True)

# 3. tracking chunk (2 s, 12 channels) — compile + steady
state = tc.init_state(12)
for ch in range(12):
    state = tc.start_channel(state, ch, 250.0 * ch - 1500.0, 80.0 * ch)
tables = jnp.asarray(tc.channel_code_tables(list(range(1, 13)), 12))
from tpu_gnss.utils.xfer import to_device_complex
spec = tc.code_spectra_np(list(range(1, 13)), 12, FS)
code_ffts = to_device_complex(spec)
g1 = tc.second_order_gains(18.0, t_s=1e-2)
g2 = tc.second_order_gains(2.0, t_s=1e-2)
p = round(FS * 1e-3)
seg = dev[: (len(chunk) // p) * p]
for i in range(3):
    t0 = time.perf_counter()
    state, out = tc.track_epochs(seg, state, tables, fs=FS, pll_gains=g1,
                                 dll_gains=g2, epochs_per_step=10,
                                 code_ffts=code_ffts)
    arr = np.asarray(jnp.stack(
        [out.ip, out.qp, out.code_dev, out.carrier_freq]))
    print(f"track 2s/12ch pass {i}: {time.perf_counter()-t0:.1f}s "
          f"(drain {arr.nbytes/1e3:.0f} kB)", flush=True)

print("PAYLOAD_DONE", flush=True)
