"""Multi-host tests via N-process simulation (SURVEY §4(c)).

Real 2-host execution is emulated by spawning 2 OS processes, each with
2 virtual CPU devices and gloo cross-process collectives, joined by
`jax.distributed` into one 4-device mesh — the podless analog of a
2-host TPU slice over DCN.  The assertion closes the loop the reference
never could: the DCN-sharded acquisition must equal the single-process
engine bit for bit.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(tmp_path, n_proc: int, cpu_devices: int = 2,
                   blocks_per_dev: int = 2, timeout: float = 420.0):
    """Run the multihost worker in n_proc subprocesses; return npz paths."""
    port = _free_port()
    procs, outs = [], []
    env = dict(os.environ)
    # children must not inherit the parent's forced single-process setup
    env.pop("PALLAS_AXON_POOL_IPS", None)
    for pid in range(n_proc):
        out = str(tmp_path / f"mh_{pid}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "tpu_gnss.dist.multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(n_proc),
             "--process-id", str(pid),
             "--cpu-devices", str(cpu_devices),
             "--blocks-per-dev", str(blocks_per_dev),
             "--out", out],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return outs


@pytest.mark.slow
def test_two_process_acquisition_matches_single(tmp_path):
    """2 processes x 2 devices: sharded == single-process, all hosts agree."""
    outs = _spawn_workers(tmp_path, n_proc=2)
    results = [np.load(o) for o in outs]
    # (a) every host gathered identical global results
    for k in ("snr", "lo_shift", "ca_shift"):
        np.testing.assert_array_equal(results[0][k], results[1][k])
    assert int(results[0]["n_devices"]) == 4

    # (b) equal to the single-process engine on the full batch (the
    # worker's deterministic scene: seed 7, tiny 2048-pt config)
    import jax.numpy as jnp
    from tpu_gnss.config import ReceiverConfig
    from tpu_gnss.acquire.search import Searcher, acquire_bits_block
    cfg = ReceiverConfig(fs=1.024e6, fc=0.256e6, max_fo=5000.0,
                         fft_len=2048)
    searcher = Searcher(cfg, dop_chunk=2)
    rng = np.random.default_rng(7)
    n_blk = 2 * 2
    bits_all = rng.integers(0, 2, (n_blk, cfg.fft_len), dtype=np.uint8)
    for b in range(n_blk):
        res = searcher.acquire_bits(bits_all[b])
        np.testing.assert_allclose(results[0]["snr"][b],
                                   np.asarray(res.snr), rtol=1e-5)
        np.testing.assert_array_equal(results[0]["lo_shift"][b],
                                      np.asarray(res.lo_shift))
        np.testing.assert_array_equal(results[0]["ca_shift"][b],
                                      np.asarray(res.ca_shift))
