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
                   blocks_per_dev: int = 2, timeout: float = 420.0,
                   flagship: bool = False):
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
             "--out", out]
            + (["--flagship"] if flagship else []),
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


def _single_process_track_truth():
    """The worker's deterministic tracking scene, run unsharded."""
    import jax
    from tpu_gnss.config import ReceiverConfig
    from tpu_gnss.track import channel as tc
    from tpu_gnss.signal import synth

    cfg = ReceiverConfig(fs=1.024e6, fc=0.256e6, max_fo=5000.0,
                         fft_len=2048)
    n_chan, n_epochs = 8, 40
    p_len = round(cfg.fs * 1e-3)
    svs = [synth.SvSignal(prn=1 + (3 * ch) % 32,
                          doppler_hz=500.0 * (ch % 5) - 1000.0,
                          code_phase_chips=61.0 * ch % 1023.0)
           for ch in range(n_chan)]
    iq = synth.synth_baseband(svs, cfg.fs, n_epochs * p_len,
                              noise_std=0.3, seed=5)
    state = tc.init_state(n_chan)
    for ch, sv in enumerate(svs):
        state = tc.start_channel(state, ch, sv.doppler_hz,
                                 sv.code_phase_chips)
    tables = np.asarray(tc.channel_code_tables(
        [sv.prn for sv in svs], n_chan))
    gains = (tc.second_order_gains(18.0), tc.second_order_gains(2.0))
    _, out = tc.track_epochs(iq, state, tables, fs=cfg.fs,
                             pll_gains=gains[0], dll_gains=gains[1])
    return np.asarray(out.ip), p_len


@pytest.mark.slow
def test_two_process_tracking_matches_single(tmp_path):
    """2 processes: channel bank sharded ACROSS HOSTS locks and equals
    the single-process bank (VERDICT r2 #5 multi-host tracking)."""
    outs = _spawn_workers(tmp_path, n_proc=2)
    results = [np.load(o) for o in outs]
    np.testing.assert_array_equal(results[0]["track_ip"],
                                  results[1]["track_ip"])
    want_ip, p_len = _single_process_track_truth()
    got_ip = results[0]["track_ip"]
    assert got_ip.shape == want_ip.shape == (40, 8)
    np.testing.assert_allclose(got_ip, want_ip, rtol=1e-4,
                               atol=1e-2 * p_len)
    # all 8 cross-host channels locked on the real signal
    lock = np.abs(got_ip[20:]).mean(axis=0) / p_len
    assert np.all(lock > 0.25), f"multi-host channels not locked: {lock}"


@pytest.mark.slow
def test_four_process_acquisition_and_tracking(tmp_path):
    """4 processes x 2 devices: the efficiency TREND's deepest rung also
    stays exact — sharded acquisition AND cross-host tracking equal the
    single-process engines, all four hosts agreeing."""
    outs = _spawn_workers(tmp_path, n_proc=4, blocks_per_dev=1,
                          timeout=600.0)
    results = [np.load(o) for o in outs]
    for k in ("snr", "lo_shift", "ca_shift", "track_ip"):
        for r in results[1:]:
            np.testing.assert_array_equal(results[0][k], r[k])
    assert int(results[0]["n_devices"]) == 8

    # acquisition == single-process engine on the full batch
    from tpu_gnss.config import ReceiverConfig
    from tpu_gnss.acquire.search import Searcher
    cfg = ReceiverConfig(fs=1.024e6, fc=0.256e6, max_fo=5000.0,
                         fft_len=2048)
    searcher = Searcher(cfg, dop_chunk=2)
    rng = np.random.default_rng(7)
    bits_all = rng.integers(0, 2, (4, cfg.fft_len), dtype=np.uint8)
    for b in range(4):
        res = searcher.acquire_bits(bits_all[b])
        np.testing.assert_allclose(results[0]["snr"][b],
                                   np.asarray(res.snr), rtol=1e-5)
        np.testing.assert_array_equal(results[0]["ca_shift"][b],
                                      np.asarray(res.ca_shift))

    # tracking == single-process bank
    want_ip, p_len = _single_process_track_truth()
    np.testing.assert_allclose(results[0]["track_ip"], want_ip,
                               rtol=1e-4, atol=1e-2 * p_len)


@pytest.mark.slow
def test_four_process_flagship_shapes(tmp_path):
    """4 processes at the reference capture's REAL shapes (VERDICT r3
    #8): fs=5.456 MHz, 40000-pt windows, the 73-bin 136.4 Hz Doppler
    grid, and a 16-channel bank with 5456-sample epochs — the flagship
    geometry finally crossing process boundaries, not the toy config.
    All hosts must agree and equal the single-process engines."""
    outs = _spawn_workers(tmp_path, n_proc=4, blocks_per_dev=1,
                          timeout=900.0, flagship=True)
    results = [np.load(o) for o in outs]
    for k in ("snr", "lo_shift", "ca_shift", "track_ip"):
        for r in results[1:]:
            np.testing.assert_array_equal(results[0][k], r[k])
    assert int(results[0]["n_devices"]) == 8

    from tpu_gnss.config import ReceiverConfig
    from tpu_gnss.acquire.search import Searcher
    cfg = ReceiverConfig(fs=5.456e6, fc=4.092e6, max_fo=5000.0,
                         fft_len=40000)
    assert abs(cfg.dop_bin_hz - 136.4) < 0.1     # the reference bin
    searcher = Searcher(cfg, dop_chunk=8)
    rng = np.random.default_rng(7)
    bits_all = rng.integers(0, 2, (4, cfg.fft_len), dtype=np.uint8)
    for b in range(4):
        res = searcher.acquire_bits(bits_all[b])
        np.testing.assert_allclose(results[0]["snr"][b],
                                   np.asarray(res.snr), rtol=1e-5)
        np.testing.assert_array_equal(results[0]["ca_shift"][b],
                                      np.asarray(res.ca_shift))

    # flagship tracking bank: 16 channels, 200 epochs of 5456 samples,
    # every cross-host channel locked on its SV
    ip = results[0]["track_ip"]
    assert ip.shape == (200, 16)
    lock = np.abs(ip[100:]).mean(axis=0) / 5456.0
    assert np.all(lock > 0.25), f"flagship multihost bank not locked: {lock}"
