"""Folded (coherent-integration) acquisition engine tests."""

import numpy as np
import pytest

from tpu_gnss.config import ReceiverConfig, SYNTHETIC
from tpu_gnss.acquire.folded import FoldedSearcher
from tpu_gnss.acquire.search import Searcher
from tpu_gnss.io import loaders
from tpu_gnss.signal import synth

SMALL = ReceiverConfig(fs=2.048e6, fc=0.512e6, max_fo=5000.0, fft_len=4096)


def test_agrees_with_spectral_engine():
    """Folded and spectral engines must find the same signal."""
    cfg = SMALL
    dop_true = 3 * cfg.dop_bin_hz
    sv = synth.SvSignal(prn=9, doppler_hz=dop_true, code_phase_chips=100.5)
    iq = synth.synth_baseband([sv], cfg.fs, 4 * 2048, noise_std=0.5, seed=5)
    bits = synth.baseband_to_1bit_if(iq, cfg.fc, cfg.fs)

    f = FoldedSearcher(cfg, n_coherent=4)
    res = f.acquire(bits=bits)
    i = 8
    assert float(res.snr[i]) > 100
    assert abs(float(res.doppler_hz[i]) - dop_true) <= cfg.dop_bin_hz / 2
    want_lag = 100.5 / 1023 * 2048
    assert abs(int(res.ca_shift[i]) - want_lag) <= 2

    dets = f.detections(res)
    assert any(d["prn"] == 9 for d in dets)


def test_fixture_prn8(synth_fixture_path):
    cfg = SYNTHETIC
    f = FoldedSearcher(cfg, n_coherent=4)
    bits = loaders.load_1bit(synth_fixture_path, count=f.block_len)
    res = f.acquire(bits=bits)
    assert float(res.snr[7]) > 100
    assert abs(float(res.doppler_hz[7])) < cfg.dop_bin_hz / 2
    assert abs(int(res.ca_shift[7]) - (8184 - 24)) <= 8


def test_noncoherent_gain():
    """Non-coherent accumulation must raise SNR of a weak signal."""
    cfg = SMALL
    sv = synth.SvSignal(prn=22, doppler_hz=0.0, code_phase_chips=50.0,
                        amplitude=0.28)
    n_blocks = 8
    iq = synth.synth_baseband([sv], cfg.fs, n_blocks * 4 * 2048,
                              noise_std=1.0, seed=77)
    bits = synth.baseband_to_1bit_if(iq, cfg.fc, cfg.fs)
    f = FoldedSearcher(cfg, n_coherent=4)
    one = f.acquire(bits=bits, n_noncoherent=1)
    acc = f.acquire(bits=bits, n_noncoherent=n_blocks)
    assert float(acc.snr[21]) > float(one.snr[21])
    assert int(acc.ca_shift[21]) == pytest.approx(
        50.0 / 1023 * 2048, abs=2)


def test_short_input_raises():
    f = FoldedSearcher(SMALL, n_coherent=4)
    with pytest.raises(ValueError):
        f.acquire(bits=np.zeros(100, np.uint8))


def test_batched_matches_single():
    """Batched grid == per-block results."""
    import jax.numpy as jnp
    from tpu_gnss.acquire.folded import acquire_folded_batch
    cfg = SMALL
    f = FoldedSearcher(cfg, n_coherent=4)
    rng = np.random.default_rng(5)
    sv1 = synth.SvSignal(prn=11, doppler_hz=900.0, code_phase_chips=77.0)
    iq1 = synth.synth_baseband([sv1], cfg.fs, f.block_len, noise_std=0.6,
                               seed=1)
    b1 = synth.baseband_to_1bit_if(iq1, cfg.fc, cfg.fs)
    b2 = rng.integers(0, 2, f.block_len).astype(np.uint8)
    batch = jnp.asarray(np.stack([b1, b2]))
    res = acquire_folded_batch(batch, f.code_ffts_p, f.dops_hz,
                               fs=cfg.fs, lo_rate=cfg.lo_rate,
                               n_coherent=4, dop_chunk=f.dop_chunk,
                               from_bits=True)
    one = f.acquire(bits=b1)
    assert int(res.ca_shift[0][10]) == int(one.ca_shift[10])
    np.testing.assert_allclose(float(res.snr[0][10]), float(one.snr[10]),
                               rtol=1e-5)
    assert float(np.max(np.asarray(res.snr[1]))) < 25


def test_wide_doppler_folded():
    """±100 kHz replay grid (BASELINE config #4) on the folded engine."""
    from tpu_gnss.config import ReceiverConfig
    cfg = ReceiverConfig(fs=2.048e6, fc=0.512e6, max_fo=100000.0,
                         fft_len=4096)
    f = FoldedSearcher(cfg, n_coherent=4)
    # default grid: reference bins capped at 1000/n_coherent Hz (the
    # fold's scalloping bound), here 250 Hz
    assert len(f.dops_hz) == 2 * int(100000 / 250.0) + 1
    dop_true = 150 * cfg.dop_bin_hz  # 75 kHz
    sv = synth.SvSignal(prn=21, doppler_hz=dop_true, code_phase_chips=700.0)
    iq = synth.synth_baseband([sv], cfg.fs, f.block_len, noise_std=0.5,
                              seed=13)
    bits = synth.baseband_to_1bit_if(iq, cfg.fc, cfg.fs)
    res = f.acquire(bits=bits)
    assert abs(float(res.doppler_hz[20]) - dop_true) <= cfg.dop_bin_hz / 2
    assert float(res.snr[20]) > 50


def test_no_doppler_scalloping_null():
    """Grid-quantization loss is bounded across Doppler (regression).

    SMALL's window (fft 4096 at 2.048 Msps) gives 500 Hz reference
    bins, but the n_coherent=4 fold only tolerates ~250 Hz of residual
    before the per-period phasors cancel COMPLETELY: with the grid at
    the raw reference spacing, a signal at 250 or 750 Hz true Doppler
    was invisible (measured SNR ~10 vs ~130 at bin centers).  The
    default grid is now capped at 1000/n_coherent Hz, bounding the
    worst case at ~-3.9 dB; every Doppler below must clear the
    detection threshold and stay within ~4x of the best cell.
    """
    cfg = SMALL
    f = FoldedSearcher(cfg, n_coherent=4)
    assert float(f.dops_hz[1] - f.dops_hz[0]) == pytest.approx(250.0)
    snrs = {}
    for dop in (0.0, 125.0, 250.0, 375.0, 625.0, 750.0, 875.0):
        sv = synth.SvSignal(prn=17, doppler_hz=dop,
                            code_phase_chips=300.0, amplitude=0.5)
        iq = synth.synth_baseband([sv], cfg.fs, f.block_len,
                                  noise_std=0.5, seed=11)
        bits = synth.baseband_to_1bit_if(iq, cfg.fc, cfg.fs)
        res = f.acquire(bits=bits)
        snrs[dop] = float(res.snr[16])
        assert abs(float(res.doppler_hz[16]) - dop) <= 130.0, (dop, snrs)
    assert min(snrs.values()) > cfg.snr_threshold, snrs
    assert min(snrs.values()) > max(snrs.values()) / 4.0, snrs


def test_noncoherent_threshold_false_alarm_equalized():
    """T(k) is the chi^2 tail-matched threshold: identity at k=1,
    monotonically decreasing, and the stdlib Wilson-Hilferty fallback
    stays within ~7% (conservative side) of the scipy-exact value."""
    from tpu_gnss.acquire.folded import noncoherent_threshold as T
    assert T(25.0, 1) == 25.0
    vals = [T(25.0, k) for k in (1, 2, 4, 8, 16)]
    assert all(a > b for a, b in zip(vals, vals[1:]))
    assert vals[2] == pytest.approx(8.47, abs=0.05)   # k=4
    assert vals[3] == pytest.approx(5.37, abs=0.05)   # k=8
    # WH fallback (what runs without scipy)
    import math
    from statistics import NormalDist
    for k in (2, 4, 8, 16):
        v = 2.0 * k
        z = NormalDist().inv_cdf(1.0 - math.exp(-25.0))
        wh = v * (1 - 2 / (9 * v) + z * math.sqrt(2 / (9 * v))) ** 3 / v
        exact = T(25.0, k)
        # WH is least accurate at low dof (k=2: +12%); always on the
        # conservative (higher-threshold) side
        assert exact <= wh <= exact * (1.15 if k == 2 else 1.08)


def test_noncoherent_accumulation_unlocks_weak_signal():
    """A signal far below the single-block threshold is detected after
    non-coherent accumulation with the false-alarm-equalized threshold
    (the constant-25 threshold rejected it at every k, wasting the
    accumulation entirely), while pure noise stays silent at the same
    accumulated threshold."""
    cfg = SMALL
    f = FoldedSearcher(cfg, n_coherent=4)
    K = 16
    sv = synth.SvSignal(prn=22, doppler_hz=800.0, code_phase_chips=50.0,
                        amplitude=0.06)
    iq = synth.synth_baseband([sv], cfg.fs, K * f.block_len,
                              noise_std=1.0, seed=7)
    bits = synth.baseband_to_1bit_if(iq, cfg.fc, cfg.fs)
    one = f.acquire(bits=bits, n_noncoherent=1)
    assert f.detections(one) == []          # invisible single-block
    acc = f.acquire(bits=bits, n_noncoherent=K)
    dets = f.detections(acc, n_noncoherent=K)
    assert [d["prn"] for d in dets] == [22], dets
    assert abs(dets[0]["doppler_hz"] - 800.0) <= 130.0
    # false-alarm control: pure noise under the SAME k-threshold
    rng = np.random.default_rng(3)
    nbits = rng.integers(0, 2, K * f.block_len).astype(np.uint8)
    noise = f.acquire(bits=nbits, n_noncoherent=K)
    assert f.detections(noise, n_noncoherent=K) == []


def test_near_far_guard_rejects_cross_correlation():
    """Two strong SVs (SNR ~500) lift every other PRN's ACCUMULATED
    peak/avg to ~10-13 via their deterministic cross-correlation floor
    — above the k=4 thermal threshold of ~8.5.  The near-far guard
    (reject k>1 detections >13 dB below the sweep's strongest) keeps
    the accumulated sweep to exactly the real signals."""
    cfg = SMALL
    f = FoldedSearcher(cfg, n_coherent=4)
    svs = [synth.SvSignal(prn=9, doppler_hz=500.0, code_phase_chips=300.0),
           synth.SvSignal(prn=17, doppler_hz=-1200.0,
                          code_phase_chips=10.0)]
    iq = synth.synth_baseband(svs, cfg.fs, 4 * f.block_len,
                              noise_std=0.5, seed=6)
    acc = f.acquire(iq=iq, n_noncoherent=4)
    dets = f.detections(acc, n_noncoherent=4)
    assert sorted(d["prn"] for d in dets) == [9, 17], dets
