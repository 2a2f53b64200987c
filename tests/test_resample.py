"""Streaming FIR / polyphase resampler tests.

Oracle: one-shot numpy convolution and scipy.signal.resample_poly — plus
the temp_test.m identity (block filtering with tail carry == full
convolution).
"""

import numpy as np
import pytest

from tpu_gnss.signal import resample as rs


def test_fir_stream_equals_full_convolution(rng):
    """temp_test.m:10-27 identity, with ragged block sizes."""
    x = rng.standard_normal(10000)
    taps = rs.design_lowpass(63, 0.2)
    sizes = [1000, 1, 37, 4096, 5, 861, 4000]
    blocks = []
    i = 0
    for s in sizes:
        blocks.append(x[i:i + s])
        i += s
    got = np.concatenate(list(rs.fir_stream(blocks, taps)))
    want = np.convolve(x[:i], taps)[:i]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_fir_stream_complex(rng):
    x = rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
    taps = rs.design_lowpass(31, 0.25)
    got = np.concatenate(list(rs.fir_stream([x[:1000], x[1000:]], taps)))
    want = np.convolve(x, taps)[:4096]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_polyphase_matches_bruteforce(rng):
    """Output k must equal the upsample->filter->downsample definition."""
    x = rng.standard_normal(800)
    up, down = 3, 7
    r = rs.PolyphaseResampler(up, down)
    got = r.process(x)
    # reconstruct the full causal filter h (with the x-up gain)
    h = r.branches[:, ::-1].T.reshape(-1)
    # brute force: zero-stuffed upsample, convolve, take every `down`th
    u = np.zeros(len(x) * up)
    u[::up] = x
    y_full = np.convolve(u, h)
    want = y_full[::down]
    n = min(len(got), len(want))
    np.testing.assert_allclose(got[:n], want[:n], atol=1e-10)


def test_polyphase_streaming_equals_oneshot(rng):
    x = rng.standard_normal(9000)
    one = rs.PolyphaseResampler(5, 4)
    want = one.process(x)
    two = rs.PolyphaseResampler(5, 4)
    got = np.concatenate([two.process(x[:1234]), two.process(x[1234:5000]),
                          two.process(x[5000:5001]), two.process(x[5001:])])
    n = min(len(got), len(want))
    np.testing.assert_allclose(got[:n], want[:n], atol=1e-12)
    assert abs(len(got) - len(want)) <= 1


def test_rate_conversion_tone(rng):
    """A tone resampled 10.912 -> 10.23 Msps keeps its frequency."""
    fs_in, up, down = 10.912e6, 1023, 1091  # ~10.912->10.2296 Msps
    f0 = 0.5e6
    n = 40000
    t = np.arange(n) / fs_in
    x = np.cos(2 * np.pi * f0 * t)
    y = rs.resample_rational(x, up, down)
    fs_out = fs_in * up / down
    # measure output frequency by FFT peak
    spec = np.abs(np.fft.rfft(y[200:] * np.hanning(len(y) - 200)))
    f_est = np.argmax(spec) * fs_out / (len(y) - 200)
    assert abs(f_est - f0) < fs_out / (len(y) - 200) * 2


def test_remove_dc():
    x = np.array([1.0 + 2j, 3.0 + 4j])
    y = rs.remove_dc(x)
    assert abs(y.real.mean()) < 1e-12 and abs(y.imag.mean()) < 1e-12


def test_design_lowpass_dc_gain():
    taps = rs.design_lowpass(101, 0.1)
    assert abs(taps.sum() - 1.0) < 1e-12


def test_raised_cosine_rolloff_zero():
    """rolloff=0 is a pure sinc — must not divide by zero."""
    from tpu_gnss.signal.synth import raised_cosine_fir
    h = raised_cosine_fir(oversample=8, rolloff=0.0)
    t = np.arange(-3 * 8, 3 * 8 + 1) / 8.0
    np.testing.assert_allclose(h, np.sinc(t), atol=1e-12)
    h5 = raised_cosine_fir(oversample=8, rolloff=0.5)
    assert np.isfinite(h5).all()
