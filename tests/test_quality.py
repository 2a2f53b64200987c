"""Tracking-quality estimator + peak refinement tests."""

import numpy as np
import pytest

from tpu_gnss.track import quality


def _prompts(cn0_db, n_ms, rng, t=1e-3, amp_scale=1.0):
    """Simulated 1 ms prompt outputs at a given C/N0."""
    cn0 = 10 ** (cn0_db / 10)
    # amplitude A with noise sigma: SNR per 1ms = cn0 * t;  A/(sigma) =
    # sqrt(2*cn0*t)
    sigma = 100.0
    a = sigma * np.sqrt(2 * cn0 * t)
    bits = np.repeat(1.0 - 2.0 * rng.integers(0, 2, n_ms // 20 + 1), 20)[:n_ms]
    ip = a * bits + rng.normal(0, sigma, n_ms)
    qp = rng.normal(0, sigma, n_ms)
    return ip, qp


@pytest.mark.parametrize("cn0_true", [35.0, 45.0])
def test_cn0_nwpr(cn0_true, rng):
    ip, qp = _prompts(cn0_true, 4000, rng)
    est = quality.cn0_nwpr(ip, qp)
    assert abs(est - cn0_true) < 2.5, f"est {est:.1f} vs true {cn0_true}"


def test_lock_metrics(rng):
    ip, qp = _prompts(45.0, 1000, rng)
    assert quality.pll_lock_metric(ip, qp) > 0.8
    # unlocked: energy split between I and Q
    noise = rng.normal(0, 100.0, 1000)
    assert abs(quality.pll_lock_metric(noise, rng.normal(0, 100.0, 1000))) < 0.4
    assert quality.code_lock_metric(
        np.full(100, 500.0), np.full(100, 500.0), np.full(100, 1000.0)) == 2.0


def test_refine_peak():
    from tpu_gnss.acquire.folded import FoldedSearcher, refine_peak
    from tpu_gnss.config import ReceiverConfig
    from tpu_gnss.signal import synth
    cfg = ReceiverConfig(fs=2.048e6, fc=0.512e6, max_fo=5000.0,
                         fft_len=4096)
    f = FoldedSearcher(cfg, n_coherent=4)
    dop_true = 2.6 * cfg.dop_bin_hz      # deliberately off-bin
    ca_true_chips = 700.26
    sv = synth.SvSignal(prn=5, doppler_hz=dop_true,
                        code_phase_chips=ca_true_chips)
    iq = synth.synth_baseband([sv], cfg.fs, f.block_len, noise_std=0.3,
                              seed=8)
    pwr = np.asarray(f.power_grid(iq=iq))
    ref = refine_peak(pwr, np.asarray(f.dops_hz), sv_row=4)
    # refinement should land well inside a bin / sample
    assert abs(ref["doppler_hz"] - dop_true) < 0.35 * cfg.dop_bin_hz
    ca_true_samples = ca_true_chips / 1023 * 2048
    assert abs(ref["ca_shift"] - ca_true_samples) < 0.7
    # and clearly better than the integer-bin answer
    coarse = np.asarray(f.acquire(iq=iq).doppler_hz[4])
    assert abs(ref["doppler_hz"] - dop_true) <= abs(float(coarse) - dop_true)
