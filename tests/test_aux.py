"""Auxiliary subsystem tests: iono model, checkpoint/resume, metrics."""

import numpy as np
import pytest

from tpu_gnss.pvt import iono
from tpu_gnss.pvt import solve as ps
from tpu_gnss.utils import checkpoint, metrics
from tpu_gnss.nav.ephemeris import Ephemeris
from tpu_gnss.track import channel as tc


def test_az_el_zenith():
    rx = np.array(ps.geodetic_to_ecef(45.0, 10.0, 0.0))
    lat, lon = np.radians(45.0), np.radians(10.0)
    up = np.array([np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon),
                   np.sin(lat)])  # geodetic up
    sv = rx + up * 20200e3
    az, el = iono.az_el(rx, sv, lat, lon)
    assert abs(el - np.pi / 2) < 1e-9


def test_az_el_north():
    rx = np.array(ps.geodetic_to_ecef(0.0, 0.0, 0.0))
    north = rx + np.array([0.0, 0.0, 1000e3])
    az, el = iono.az_el(rx, north, 0.0, 0.0)
    assert abs(az) < 1e-6 or abs(az - 2 * np.pi) < 1e-6


def test_klobuchar_night_floor():
    """Zero coefficients at night -> 5 ns * obliquity."""
    d = iono.klobuchar_delay(np.zeros(4), np.zeros(4), lat=0.9, lon=0.1,
                             az=0.0, el=np.pi / 2, gps_tow=0.0)
    f = 1.0 + 16.0 * (0.53 - 0.5) ** 3
    assert abs(d - 5e-9 * f) < 1e-12


def test_klobuchar_typical_day():
    """Typical broadcast coefficients, midday, mid-latitude: 5-30 ns."""
    alpha = (1.1176e-8, 7.4506e-9, -5.9605e-8, -5.9605e-8)
    beta = (90112.0, 0.0, -196610.0, -65536.0)
    d = iono.klobuchar_delay(alpha, beta, lat=np.radians(40),
                             lon=np.radians(-100), az=np.radians(210),
                             el=np.radians(20), gps_tow=50400.0 + 7200)
    assert 5e-9 < d < 60e-9
    # correction in meters is positive and bounded
    m = 2.99792458e8 * d
    assert 1.0 < m < 20.0


def test_checkpoint_roundtrip(tmp_path):
    eph = Ephemeris(week=900, iodc=7, iode2=7, iode3=7, sqrt_a=5153.0,
                    e=0.01, t_oe=302400.0, tow=50000)
    eph.alpha = (1e-8, 0.0, 0.0, 0.0)
    state = tc.init_state(4)
    state = tc.start_channel(state, 1, 1500.0, 333.5)
    dets = [dict(prn=9, snr=55.5, doppler_hz=1500.0, ca_shift=123)]
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_state(p, ephemerides={9: eph}, channel_state=state,
                          detections=dets, meta=dict(fs=5.456e6))
    back = checkpoint.load_state(p)
    e2 = back["ephemerides"][9]
    assert e2.valid() == eph.valid()
    assert e2.sqrt_a == eph.sqrt_a
    assert e2.tow == 50000 and isinstance(e2.tow, int)
    assert e2.alpha[0] == pytest.approx(1e-8)
    st2 = back["channel_state"]
    assert bool(np.asarray(st2.active)[1])
    assert float(np.asarray(st2.carrier_seed)[1]) == 1500.0
    assert back["detections"] == dets
    assert back["meta"]["fs"] == 5.456e6


def test_metrics_registry():
    m = metrics.Metrics()
    with m.stage("acq", samples=1000):
        pass
    with m.stage("acq", samples=1000):
        pass
    m.add("fixes")
    assert m.throughput("acq") > 0
    rep = m.report()
    assert "acq" in rep and "fixes" in rep


def test_channel_bars():
    out = metrics.channel_bars([1, 22], [1e6, 4e6], width=10,
                               lo_freqs=[100.0, -250.0],
                               statuses=["track", "acq"])
    lines = out.splitlines()
    assert "PRN  1" in lines[0] and "PRN 22" in lines[1]
    assert lines[1].count("#") == 10  # strongest fills the bar
    assert "track" in lines[0]


def test_latlon_dms_and_day_time():
    from tpu_gnss.utils import metrics
    s = metrics.latlon_dms(52.95, -1.15)  # Nottingham-ish
    assert s.startswith("52°57'00.00\"N")
    assert "1°09'00.00\"W" in s
    s2 = metrics.latlon_dms(-33.5, 151.25)
    assert '"S' in s2 and '"E' in s2
    # TOW 0 = Sunday 00:00:00; 86400+3723.5 = Monday 01:02:03.5
    assert metrics.gps_day_time(1910, 0.0) == \
        "week 1910 Sunday 00:00:00.000 GPS"
    assert metrics.gps_day_time(1910, 86400 + 3723.5) == \
        "week 1910 Monday 01:02:03.500 GPS"


def test_playback_adsb_profile(capsys):
    from tpu_gnss.cli import playback
    playback.main(["plan", "adsb_for_hackrf.bin", "--profile", "adsb"])
    out = capsys.readouterr().out
    assert "hackrf_transfer -s 2000000 -f 1176450000" in out


def test_iq_scatter_and_log(tmp_path):
    """IQ scatter renders clusters; npz log round-trips (FPGA IQ-log analog)."""
    import numpy as np
    from tpu_gnss.utils import metrics

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 400) * 2 - 1
    ip = 1000.0 * bits + 30.0 * rng.standard_normal(400)
    qp = 30.0 * rng.standard_normal(400)
    art = metrics.iq_scatter_ascii(ip, qp)
    lines = art.splitlines()
    assert len(lines) == 21 and all(len(l) == 21 for l in lines)
    mid = 10
    # locked Costas: two clusters on the I axis, nothing top/bottom
    assert any(c not in " |-" for c in lines[mid])
    assert all(c in " |-" for c in lines[0] + lines[-1])

    class Rec:
        def __init__(self):
            self.prn = 7
            self.ip_hist = ip.tolist()
            self.qp_hist = qp.tolist()
            self.code_freq_hist = [1.023e6] * 400

    path = str(tmp_path / "iq.npz")
    metrics.save_iq_log(path, [Rec()])
    dat = np.load(path)
    assert np.allclose(dat["prn07_ip"], np.asarray(ip, np.float32))
    assert dat["prn07_code_freq"].shape == (400,)
