import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
from tpu_gnss.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax
import numpy as np
t0=time.perf_counter()
from tpu_gnss.config import ReceiverConfig
from tpu_gnss.acquire.folded import FoldedSearcher
cfg = ReceiverConfig(fs=2.048e6, fc=2.048e6/4, max_fo=5000.0, fft_len=4096, snr_threshold=17.0, num_chans=12)
print(f"imports {time.perf_counter()-t0:.2f}s", flush=True)
t0=time.perf_counter(); s=FoldedSearcher(cfg, n_coherent=4)
print(f"searcher ctor {time.perf_counter()-t0:.2f}s", flush=True)
t0=time.perf_counter(); cw=s.mxu_code_planes()
import jax.numpy as jnp; jax.block_until_ready(cw)
print(f"code planes {time.perf_counter()-t0:.2f}s", flush=True)
rng=np.random.default_rng(0)
bits=rng.integers(0,2,4*s.block_len,dtype=np.uint8)
t0=time.perf_counter(); d=s.detections_refined_fast(bits=bits)
print(f"first refined detect {time.perf_counter()-t0:.2f}s", flush=True)
t0=time.perf_counter(); d=s.detections_refined_fast(bits=bits)
print(f"second refined detect {time.perf_counter()-t0:.2f}s", flush=True)
t0=time.perf_counter(); d=s.detections_refined_fast(bits=bits, n_noncoherent=4)
print(f"first weak (nc=4) detect {time.perf_counter()-t0:.2f}s", flush=True)
