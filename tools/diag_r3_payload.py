"""Round-3 diagnostics on the real TPU: tunnel bandwidth + IQ-path stages.

Answers two questions the round-2 artifacts left open:
1. What is the host->device / device->host bandwidth of the tunneled
   chip (per transfer size)?  This sets the ceiling for every capture
   format's realtime factor.
2. Where does the complex-IQ path's 9.8 s wall actually go (transfer vs
   host quantize vs device compute vs drain bookkeeping)?
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np

from tpu_gnss.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()

import jax, jax.numpy as jnp
t0 = time.perf_counter()
print("alive:", np.asarray(jnp.arange(2) + 1),
      f"({time.perf_counter()-t0:.1f}s)", flush=True)

results = {}

# --- upload bandwidth ------------------------------------------------------
reduce_fn = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
for mb in (1, 4, 16, 32):
    a = np.random.default_rng(0).integers(-127, 127, mb << 20, dtype=np.int8)
    # warm
    np.asarray(reduce_fn(jnp.asarray(a[: 1 << 20])))
    t0 = time.perf_counter()
    d = jnp.asarray(a)
    d.block_until_ready()
    t_put = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(reduce_fn(d))
    t_use = time.perf_counter() - t0
    results[f"up_i8_{mb}MB_s"] = round(t_put, 4)
    results[f"up_i8_{mb}MB_MBps"] = round(mb / t_put, 1)
    print(f"upload {mb} MB int8: put {t_put:.3f}s ({mb/t_put:.1f} MB/s), "
          f"reduce-after {t_use:.3f}s", flush=True)

# uint32 words (the packed path's dtype) — same bytes, different dtype
for mb in (4,):
    a = np.random.default_rng(0).integers(0, 2**32, (mb << 20) // 4,
                                          dtype=np.uint32)
    np.asarray(reduce_fn(jnp.asarray(a[: 1024])))
    t0 = time.perf_counter()
    d = jnp.asarray(a); d.block_until_ready()
    t_put = time.perf_counter() - t0
    results[f"up_u32_{mb}MB_MBps"] = round(mb / t_put, 1)
    print(f"upload {mb} MB uint32: {t_put:.3f}s ({mb/t_put:.1f} MB/s)",
          flush=True)

# float32 upload (the to_device_complex plane path)
for mb in (16,):
    a = np.random.default_rng(0).standard_normal((mb << 20) // 4).astype(np.float32)
    t0 = time.perf_counter()
    d = jnp.asarray(a); d.block_until_ready()
    t_put = time.perf_counter() - t0
    results[f"up_f32_{mb}MB_MBps"] = round(mb / t_put, 1)
    print(f"upload {mb} MB f32: {t_put:.3f}s ({mb/t_put:.1f} MB/s)", flush=True)

# --- download bandwidth ----------------------------------------------------
gen = jax.jit(lambda n: jnp.zeros(n, jnp.float32) + 1.5, static_argnums=0)
for mb in (1, 8):
    d = gen((mb << 20) // 4); d.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(d)
    t_get = time.perf_counter() - t0
    results[f"down_f32_{mb}MB_MBps"] = round(mb / t_get, 1)
    print(f"download {mb} MB f32: {t_get:.3f}s ({mb/t_get:.1f} MB/s)",
          flush=True)

# dispatch latency: tiny op round trip
tiny = jax.jit(lambda x: x + 1)
d = jnp.zeros(8); np.asarray(tiny(d))
t0 = time.perf_counter()
for _ in range(10):
    np.asarray(tiny(d))
lat = (time.perf_counter() - t0) / 10
results["roundtrip_ms"] = round(lat * 1e3, 2)
print(f"tiny round-trip: {lat*1e3:.1f} ms", flush=True)

# --- IQ-path stage breakdown ----------------------------------------------
from tpu_gnss.config import ReceiverConfig
from tpu_gnss.receiver import Receiver
from tpu_gnss.utils import metrics
import tests.test_e2e as E

_cache = "/tmp/e2e_scene_20s.npz"
if os.path.exists(_cache):
    _z = np.load(_cache)
    iq, rx = _z["iq"], _z["rx"]
else:
    iq, ephs, rx = E.build_scene()
    np.savez(_cache, iq=iq, rx=np.asarray(rx))
duration = len(iq) / E.FS
cfg = ReceiverConfig(fs=E.FS, fc=E.FS / 4, max_fo=5000.0, fft_len=4096,
                     snr_threshold=20.0, num_chans=12)
for attempt in range(2):
    recv = Receiver(cfg)
    metrics.METRICS.timings.clear()
    t0 = time.perf_counter()
    res_iq = recv.process_iq(iq, max_channels=8)
    wall = time.perf_counter() - t0
    print(f"iq pass {attempt}: {wall:.1f}s ({duration/wall:.2f}x)", flush=True)
results["iq_wall_s"] = round(wall, 2)
results["iq_realtime"] = round(duration / wall, 2)
results["iq_stages"] = {k: round(sum(v), 3)
                        for k, v in metrics.METRICS.timings.items()}
print(metrics.METRICS.report(), flush=True)

import json
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DIAG_r3.json"), "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results))
print("PAYLOAD_DONE")
