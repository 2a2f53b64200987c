"""Tracking channel bank tests on synthetic baseband with ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_gnss.constants import CHIP_RATE_HZ, CODES_PER_BIT, L1_HZ
from tpu_gnss.signal import synth
from tpu_gnss.track import channel as tc

FS = 5.456e6  # Nottingham rate: 5.33 samples/chip, incommensurate with
# the chip rate so chip-boundary sample phases vary across the code and the
# E-L discriminator S-curve is smooth (commensurate rates create staircase
# dead zones — worst case for any sampled DLL, including the reference's)


def _run_bank(svs, n_epochs, noise=0.0, seed=0, start_err_chips=0.0,
              start_err_hz=0.0, n_chan=None):
    n_chan = n_chan or len(svs)
    iq = synth.synth_baseband(svs, FS, n_epochs * 5456, noise_std=noise,
                              seed=seed)
    state = tc.init_state(n_chan)
    for ch, sv in enumerate(svs):
        state = tc.start_channel(
            state, ch, sv.doppler_hz + start_err_hz,
            sv.code_phase_chips + start_err_chips)
    tables = tc.channel_code_tables([sv.prn for sv in svs], n_chan)
    final, out = tc.track_epochs(
        jnp.asarray(iq), state, jnp.asarray(tables), fs=FS,
        pll_gains=tc.second_order_gains(18.0),
        dll_gains=tc.second_order_gains(2.0))
    return final, out


def _phase_err_chips(out, ch, sv, n_epochs):
    """Tracked code phase minus ground truth, per epoch start (chips)."""
    code_rate_true = CHIP_RATE_HZ * (1.0 + sv.doppler_hz / L1_HZ)
    t = np.arange(n_epochs) * 5456 / FS
    true_phase = (sv.code_phase_chips + code_rate_true * t) % 1023
    est = np.asarray(out.code_phase[:, ch])
    return (est - true_phase + 511.5) % 1023 - 511.5


def test_lock_from_imperfect_seed():
    """Converge from half-chip / half-bin seed errors (acquisition grade)."""
    n_epochs = 800
    svs = [synth.SvSignal(prn=7, doppler_hz=1234.0, code_phase_chips=500.25)]
    final, out = _run_bank(svs, n_epochs, noise=0.5, start_err_chips=0.4,
                           start_err_hz=150.0)
    cf = np.asarray(out.carrier_freq[:, 0])
    assert abs(cf[-50:].mean() - 1234.0) < 5.0, "carrier must lock"
    err = _phase_err_chips(out, 0, svs[0], n_epochs)
    tail = err[-300:]
    assert np.abs(tail).max() < 0.2, "code phase must track truth"
    # residual drift < 0.3 chips/s (linear fit; floor-sampled replicas make
    # the discriminator plateau ±1/(2*samples_per_chip), so short-window
    # slopes wander)
    t_tail = np.arange(len(tail)) * 5456 / FS
    drift = np.polyfit(t_tail, tail, 1)[0]
    assert abs(drift) < 0.3
    # prompt power should dominate E/L at lock
    ip = np.asarray(out.ip[-50:, 0])
    assert np.abs(ip).mean() > 0.5 * 5456  # most energy in I


def test_multichannel_independent():
    """Two SVs tracked simultaneously without cross-talk."""
    svs = [synth.SvSignal(prn=3, doppler_hz=-2000.0, code_phase_chips=10.0),
           synth.SvSignal(prn=19, doppler_hz=3500.0, code_phase_chips=900.0)]
    final, out = _run_bank(svs, 300, noise=0.5)
    cf = np.asarray(out.carrier_freq)
    assert abs(cf[-30:, 0].mean() + 2000.0) < 5.0
    assert abs(cf[-30:, 1].mean() - 3500.0) < 5.0


def test_nav_bit_demod_ber0():
    """Recover known NAV bits with zero errors after lock."""
    rng = np.random.default_rng(3)
    bits = 1.0 - 2.0 * rng.integers(0, 2, 40).astype(np.float64)
    svs = [synth.SvSignal(prn=12, doppler_hz=800.0, code_phase_chips=0.0,
                          nav_bits=bits)]
    n_epochs = 40 * CODES_PER_BIT  # 800 ms
    final, out = _run_bank(svs, n_epochs, noise=0.3)
    ip = np.asarray(out.ip[:, 0])
    # skip first 100 ms (pull-in), then integrate per 20-epoch bit
    start = 100
    start -= start % CODES_PER_BIT
    got = []
    want = []
    for b in range(start // CODES_PER_BIT, 40):
        seg = ip[b * CODES_PER_BIT:(b + 1) * CODES_PER_BIT]
        got.append(np.sign(seg.sum()))
        want.append(bits[b])
    got = np.asarray(got)
    want = np.asarray(want)
    # Costas has a 180-degree ambiguity: accept either polarity globally
    agree = (got == want).mean()
    assert agree in (0.0, 1.0) or agree > 0.99 or agree < 0.01, \
        f"BER must be 0 up to polarity, agree={agree}"


def test_inactive_channels_untouched():
    svs = [synth.SvSignal(prn=5, doppler_hz=0.0, code_phase_chips=0.0)]
    final, out = _run_bank(svs, 50, n_chan=4)
    assert not bool(np.asarray(final.active)[3])
    assert float(np.asarray(final.pwr_avg)[3]) == 0.0
    assert float(np.asarray(final.code_dev)[3]) == 0.0


def test_carrier_pull_in():
    """Code-rate derived carrier reseed lands near the true Doppler."""
    svs = [synth.SvSignal(prn=30, doppler_hz=2500.0, code_phase_chips=0.0)]
    final, out = _run_bank(svs, 400, noise=0.2, start_err_hz=60.0)
    pulled = tc.carrier_pull_in(final)
    seed = float(np.asarray(pulled.carrier_seed)[0])
    assert abs(seed - 2500.0) < 25.0


def test_epochs_per_step_locks():
    """Decimated loop updates (4 epochs/step) still lock and track."""
    import jax.numpy as jnp
    n_epochs = 800
    sv = synth.SvSignal(prn=7, doppler_hz=1234.0, code_phase_chips=500.25)
    iq = synth.synth_baseband([sv], FS, n_epochs * 5456, noise_std=0.5,
                              seed=0)
    state = tc.init_state(1)
    state = tc.start_channel(state, 0, 1234.0 + 150.0, 500.25 + 0.4)
    tables = tc.channel_code_tables([7], 1)
    final, out = tc.track_epochs(
        jnp.asarray(iq), state, jnp.asarray(tables), fs=FS,
        pll_gains=tc.second_order_gains(18.0, t_s=4e-3),
        dll_gains=tc.second_order_gains(2.0, t_s=4e-3),
        epochs_per_step=4)
    assert out.ip.shape[0] == n_epochs  # per-epoch outputs preserved
    cf = np.asarray(out.carrier_freq[:, 0])
    assert abs(cf[-50:].mean() - 1234.0) < 5.0
    err = _phase_err_chips(out, 0, sv, n_epochs)
    assert np.abs(err[-200:]).max() < 0.25


def test_agc_hysteresis():
    """Strong-signal AGC engages above hi, holds between lo and hi, and
    tracking still locks with the halved Costas gain
    (reference: c/channel.cpp:265-288)."""
    import jax.numpy as jnp
    n_epochs = 600
    sv = synth.SvSignal(prn=7, doppler_hz=1234.0, code_phase_chips=500.25)
    iq = synth.synth_baseband([sv], FS, n_epochs * 5456, noise_std=0.3,
                              seed=0)
    state = tc.init_state(2)
    state = tc.start_channel(state, 0, 1234.0 + 100.0, 500.25 + 0.3)
    tables = jnp.asarray(tc.channel_code_tables([7], 2))
    gains = (tc.second_order_gains(18.0), tc.second_order_gains(2.0))
    # prompt power in lock ~ (0.9 * 5456)^2; thresholds well below that
    p_lock = (0.9 * 5456.0) ** 2
    final, out = tc.track_epochs(
        jnp.asarray(iq), state, tables, fs=FS,
        pll_gains=gains[0], dll_gains=gains[1],
        agc_thresholds=(0.2 * p_lock, 0.4 * p_lock))
    assert bool(np.asarray(final.agc_on)[0]), "AGC must engage in lock"
    assert not bool(np.asarray(final.agc_on)[1]), "inactive channel off"
    cf = np.asarray(out.carrier_freq[:, 0])
    assert abs(cf[-50:].mean() - 1234.0) < 5.0, "still locks with AGC"
    # thresholds far above any achievable power: AGC must stay off
    final2, _ = tc.track_epochs(
        jnp.asarray(iq), state, tables, fs=FS,
        pll_gains=gains[0], dll_gains=gains[1],
        agc_thresholds=(1e14, 2e14))
    assert not bool(np.asarray(final2.agc_on)[0])


def test_fft_correlator_matches_gather():
    """FFT-dot and resampled-code correlators agree in lock."""
    import jax.numpy as jnp
    n_epochs = 400
    sv = synth.SvSignal(prn=7, doppler_hz=1234.0, code_phase_chips=500.25)
    iq = synth.synth_baseband([sv], FS, n_epochs * 5456, noise_std=0.3,
                              seed=0)
    state = tc.init_state(1)
    state = tc.start_channel(state, 0, 1234.0, 500.25)
    tables = jnp.asarray(tc.channel_code_tables([7], 1))
    gains = (tc.second_order_gains(18.0), tc.second_order_gains(2.0))
    _, out_g = tc.track_epochs(jnp.asarray(iq), state, tables, fs=FS,
                               pll_gains=gains[0], dll_gains=gains[1])
    spec, nf = tc.code_spectra([7], 1, FS)
    _, out_f = tc.track_epochs(jnp.asarray(iq), state, tables, fs=FS,
                               pll_gains=gains[0], dll_gains=gains[1],
                               code_ffts=spec)
    ip_g = np.asarray(out_g.ip[-100:, 0])
    ip_f = np.asarray(out_f.ip[-100:, 0])
    # both locked; the FFT tap pays ~1 dB interpolating the rectangular
    # chips against a floor-sampled synthetic (real band-limited RF does
    # not show this)
    assert np.abs(ip_f).mean() > 0.75 * np.abs(ip_g).mean()
    assert np.sign(ip_f[-1]) == np.sign(ip_g[-1])
    # and code phase tracks truth through the FFT path too
    err = _phase_err_chips(out_f, 0, sv, n_epochs)
    assert np.abs(err[-100:]).max() < 0.2


def test_pallas_correlator_matches_einsum():
    """Fused MXU correlator (interpret mode) == einsum FFT-dot path."""
    import jax.numpy as jnp
    n_epochs = 12
    E = 4
    svs = [synth.SvSignal(prn=7, doppler_hz=1234.0, code_phase_chips=500.25),
           synth.SvSignal(prn=21, doppler_hz=-2100.0,
                          code_phase_chips=12.75, amplitude=0.7)]
    iq = synth.synth_baseband(svs, FS, n_epochs * 5456, noise_std=0.3,
                              seed=4)
    state = tc.init_state(2)
    state = tc.start_channel(state, 0, 1234.0, 500.25)
    state = tc.start_channel(state, 1, -2100.0, 12.75)
    tables = jnp.asarray(tc.channel_code_tables([7, 21], 2))
    spec, nf = tc.code_spectra([7, 21], 2, FS)
    gains = (tc.second_order_gains(18.0, t_s=E * 1e-3),
             tc.second_order_gains(2.0, t_s=E * 1e-3))
    st_x, out_x = tc.track_epochs(jnp.asarray(iq), state, tables, fs=FS,
                                  pll_gains=gains[0], dll_gains=gains[1],
                                  epochs_per_step=E, code_ffts=spec,
                                  use_pallas=False)
    st_p, out_p = tc.track_epochs(jnp.asarray(iq), state, tables, fs=FS,
                                  pll_gains=gains[0], dll_gains=gains[1],
                                  epochs_per_step=E, code_ffts=spec,
                                  use_pallas=True)
    ref = np.abs(np.asarray(out_x.ip)).max()
    np.testing.assert_allclose(np.asarray(out_p.ip), np.asarray(out_x.ip),
                               atol=2e-3 * ref)
    np.testing.assert_allclose(np.asarray(out_p.qp), np.asarray(out_x.qp),
                               atol=2e-3 * ref)
    np.testing.assert_allclose(np.asarray(out_p.e_mag),
                               np.asarray(out_x.e_mag), atol=2e-3 * ref)
    np.testing.assert_allclose(np.asarray(out_p.code_phase),
                               np.asarray(out_x.code_phase), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_p.carrier_freq),
                               np.asarray(st_x.carrier_freq), atol=0.05)


def test_pallas_correlator_odd_channel_count():
    """Channel padding covers banks that are not kernel-group multiples."""
    import jax.numpy as jnp
    from tpu_gnss.ops.mxu_track import pad_channels
    assert pad_channels(5) == 8
    assert pad_channels(12) == 16
    assert pad_channels(20) == 32
    assert pad_channels(33) == 48
    n_chan = 20   # pads to 32 = two kernel groups (was an OOB crash)
    n_epochs = 8
    sv = synth.SvSignal(prn=9, doppler_hz=700.0, code_phase_chips=101.5)
    iq = synth.synth_baseband([sv], FS, n_epochs * 5456, noise_std=0.3,
                              seed=9)
    prns = [(i % 32) + 1 for i in range(n_chan)]
    state = tc.init_state(n_chan)
    state = tc.start_channel(state, 8, 700.0, 101.5)  # PRN 9 at slot 8
    tables = jnp.asarray(tc.channel_code_tables(prns, n_chan))
    spec, _ = tc.code_spectra(prns, n_chan, FS)
    gains = (tc.second_order_gains(18.0, t_s=4e-3),
             tc.second_order_gains(2.0, t_s=4e-3))
    _, out_x = tc.track_epochs(jnp.asarray(iq), state, tables, fs=FS,
                               pll_gains=gains[0], dll_gains=gains[1],
                               epochs_per_step=4, code_ffts=spec,
                               use_pallas=False)
    _, out_p = tc.track_epochs(jnp.asarray(iq), state, tables, fs=FS,
                               pll_gains=gains[0], dll_gains=gains[1],
                               epochs_per_step=4, code_ffts=spec,
                               use_pallas=True)
    ref = np.abs(np.asarray(out_x.ip)).max()
    np.testing.assert_allclose(np.asarray(out_p.ip), np.asarray(out_x.ip),
                               atol=2e-3 * ref)


def test_fft_correlator_non128_nf():
    """fs=10e6 (the LIVE preset rate): P = nf = 10000 is 2/5-smooth but
    NOT divisible by 128 — the einsum FFT-dot path must still build its
    fractional-lag ramps (regression: _frac_ramp hardcoded K=128 and
    crashed on every default-rate receiver)."""
    import jax.numpy as jnp
    fs = 10e6
    n_epochs = 8
    sv = synth.SvSignal(prn=5, doppler_hz=900.0, code_phase_chips=300.5)
    iq = synth.synth_baseband([sv], fs, n_epochs * 10000, noise_std=0.2,
                              seed=11)
    state = tc.start_channel(tc.init_state(1), 0, 900.0, 300.5)
    tables = jnp.asarray(tc.channel_code_tables([5], 1))
    spec, nf = tc.code_spectra([5], 1, fs)
    assert nf == 10000 and nf % 128 != 0
    gains = (tc.second_order_gains(18.0, t_s=4e-3),
             tc.second_order_gains(2.0, t_s=4e-3))
    _, out = tc.track_epochs(jnp.asarray(iq), state, tables, fs=fs,
                             pll_gains=gains[0], dll_gains=gains[1],
                             epochs_per_step=4, code_ffts=spec,
                             use_pallas=False)
    ip = np.asarray(out.ip)[:, 0]
    assert np.isfinite(ip).all()
    # locked onto the synthetic SV: prompt power far above the noise
    assert np.abs(ip[-4:]).mean() > 5.0 * 0.2 * np.sqrt(10000) / np.sqrt(2)


def test_pallas_correlator_odd_n1():
    """nf = 12500 factors as (n1, n2) = (125, 100) with ODD n1: the
    kernel's signed-frequency boundary cuts a column mid-way (regression:
    whole column n1//2 was treated as upper-half, corrupting the prompt
    ramp phases for half its bins)."""
    import jax.numpy as jnp
    from tpu_gnss.ops.mxu_corr import split_nf
    fs = 12.5e6
    assert split_nf(12500) == (125, 100)
    n_epochs = 8
    svs = [synth.SvSignal(prn=3, doppler_hz=-1500.0,
                          code_phase_chips=77.25)]
    iq = synth.synth_baseband(svs, fs, n_epochs * 12500, noise_std=0.2,
                              seed=12)
    state = tc.start_channel(tc.init_state(1), 0, -1500.0, 77.25)
    tables = jnp.asarray(tc.channel_code_tables([3], 1))
    spec, nf = tc.code_spectra([3], 1, fs)
    assert nf == 12500
    gains = (tc.second_order_gains(18.0, t_s=4e-3),
             tc.second_order_gains(2.0, t_s=4e-3))
    _, out_x = tc.track_epochs(jnp.asarray(iq), state, tables, fs=fs,
                               pll_gains=gains[0], dll_gains=gains[1],
                               epochs_per_step=4, code_ffts=spec,
                               use_pallas=False)
    _, out_p = tc.track_epochs(jnp.asarray(iq), state, tables, fs=fs,
                               pll_gains=gains[0], dll_gains=gains[1],
                               epochs_per_step=4, code_ffts=spec,
                               use_pallas=True)
    ref = np.abs(np.asarray(out_x.ip)).max()
    np.testing.assert_allclose(np.asarray(out_p.ip), np.asarray(out_x.ip),
                               atol=4e-3 * ref)
    np.testing.assert_allclose(np.asarray(out_p.qp), np.asarray(out_x.qp),
                               atol=4e-3 * ref)


def test_track_corr_odd_n1_ramp_cells():
    """Direct kernel-vs-numpy check of the prompt ramp at odd n1 with a
    worst-case fractional lag (tau % 1 = 0.5 flips the upper-half
    phasor): the 50 boundary-column cells at k2 >= n2//2 must use
    k_eff = k - NF.  Catches the whole-column misclassification the
    end-to-end loop test is too coarse to see (~13% cp error)."""
    import jax.numpy as jnp
    from tpu_gnss.ops import mxu_track as mt
    from tpu_gnss.ops.mxu_corr import split_nf
    nf = period = 12500
    n1, n2 = split_nf(nf)
    assert n1 % 2 == 1
    u_rows = mt.track_tables(nf, period, 0.0)[0]
    assert u_rows * n1 == nf
    rng = np.random.default_rng(5)
    y = rng.standard_normal(nf) + 1j * rng.standard_normal(nf)
    spec = rng.standard_normal((1, nf)) + 1j * rng.standard_normal((1, nf))
    tau = 431.5
    # exact reference: cp = sum_k spec[k] * FFT(y)[k] * e^{-j2pi keff tau/nf} / nf
    k = np.arange(nf)
    keff = np.where(k >= nf // 2, k - nf, k)
    g = np.fft.fft(y)
    cp_ref = np.sum(spec[0] * g * np.exp(-2j * np.pi * keff * tau / nf)) / nf

    blk = y.reshape(u_rows, n1)   # row-major: time n = n1*u + v at [u, v]
    blk_tr = jnp.asarray(blk.T.real, jnp.float32)[None]
    blk_ti = jnp.asarray(blk.T.imag, jnp.float32)[None]
    n_pad = mt.pad_channels(1)
    cw_r, cw_i = mt.spec_planes(jnp.asarray(spec), nf, n_pad)
    params = np.zeros((1, n_pad, 128), np.float32)
    params[0, 0, 2] = tau          # phase0 = delta = 0: no carrier wipe
    out = np.asarray(mt.track_corr(blk_tr, blk_ti, jnp.asarray(params),
                                   cw_r, cw_i, period=period, nf=nf,
                                   interpret=True))
    cp = complex(out[0, 0, 0], out[0, 0, 1])
    assert abs(cp - cp_ref) < 0.05 * abs(cp_ref), (cp, cp_ref)


def _chirp_iq(prn, n, f0, ramp_hz_s, cp0=200.0, noise=0.5, seed=0,
              fs=2.048e6):
    """One SV with a linear carrier-Doppler ramp, code rate coherent."""
    from tpu_gnss.signal import cacode
    t = np.arange(n, dtype=np.float64) / fs
    ph = f0 * t + 0.5 * ramp_hz_s * t * t          # carrier cycles
    code_phase = cp0 + CHIP_RATE_HZ * (t + ph / L1_HZ)
    code = 1.0 - 2.0 * cacode.code_table()[prn - 1][
        np.floor(code_phase).astype(np.int64) % 1023]
    iq = code * np.exp(2j * np.pi * ph)
    rng = np.random.default_rng(seed)
    iq = iq + noise / np.sqrt(2) * (rng.standard_normal(n)
                                    + 1j * rng.standard_normal(n))
    return iq.astype(np.complex64)


@pytest.mark.parametrize("eps", [2, 10])
def test_doppler_ramp_tolerance(eps):
    """Loop-rate audit (VERDICT r3 #6): the default 100 Hz update rate
    (epochs_per_step=10, a 5.5x ratio to the 18 Hz PLL) tracks a
    60 Hz/s carrier ramp — 12x the upper bound of ground-static sky
    dynamics plus oscillator drift (~5 Hz/s).  The swept data behind
    the pinned rate: lock holds through >=120 Hz/s at every update rate
    in {100, 200, 500} Hz because the gains scale with t_s (identical
    continuous-time loop); the ramp only costs the deterministic
    2nd-order phase lag ~2*pi*ramp/wn^2."""
    fs = 2.048e6
    p = 2048
    f0, ramp, secs = 1000.0, 60.0, 5.0
    n_ep = int(secs * 1000)
    iq = _chirp_iq(7, n_ep * p, f0, ramp, fs=fs)
    state = tc.init_state(1)
    state = tc.start_channel(state, 0, f0, 200.0)
    tables = tc.channel_code_tables([7], 1)
    t_s = eps * 1e-3
    _, out = tc.track_epochs(
        jnp.asarray(iq), state, jnp.asarray(tables), fs=fs,
        pll_gains=tc.second_order_gains(18.0, t_s=t_s),
        dll_gains=tc.second_order_gains(2.0, t_s=t_s),
        epochs_per_step=eps)
    cf = np.asarray(out.carrier_freq[:, 0])
    f_end = f0 + ramp * secs
    assert abs(cf[-100:].mean() - f_end) < 15.0, (
        f"carrier did not follow the ramp: {cf[-100:].mean()} vs {f_end}")
    # code phase stays on truth (the ramp-coherent code rate)
    t = np.arange(n_ep) * 1e-3
    cp_true = (200.0 + CHIP_RATE_HZ
               * (t + (f0 * t + 0.5 * ramp * t * t) / L1_HZ)) % 1023
    est = np.asarray(out.code_phase[:, 0])
    err = (est - cp_true + 511.5) % 1023 - 511.5
    assert np.abs(err[-500:]).max() < 0.4, "code tracking lost under ramp"
    # Costas stays locked (most energy in I despite the ramp phase lag)
    ip = np.asarray(out.ip[-200:, 0])
    assert np.abs(ip).mean() / p > 0.7
