"""NAV bit/parity/ephemeris codec tests."""

import numpy as np
import pytest

from tpu_gnss.constants import CODES_PER_BIT, PREAMBLE
from tpu_gnss.nav import bits as nb
from tpu_gnss.nav import ephemeris as ne
from tpu_gnss.constants import PI_GPS

# A realistic ephemeris (values in ICD ranges, exactly representable at
# their scale factors after round-trip)
EPH = ne.Ephemeris(
    week=994, t_gd=2.0 ** -31 * 13, iodc=45, t_oc=16 * 23456,
    a_f2=0.0, a_f1=2.0 ** -43 * -7, a_f0=2.0 ** -31 * 12345,
    iode2=45, c_rs=2.0 ** -5 * 97, dn=2.0 ** -43 * PI_GPS * 12000,
    m_0=2.0 ** -31 * PI_GPS * 123456789, c_uc=2.0 ** -29 * 55,
    e=2.0 ** -33 * 42949672, c_us=2.0 ** -29 * 88,
    sqrt_a=2.0 ** -19 * 2702921936, t_oe=16 * 23456,
    c_ic=2.0 ** -29 * -20, omega_0=2.0 ** -31 * PI_GPS * -987654321,
    c_is=2.0 ** -29 * 15, i_0=2.0 ** -31 * PI_GPS * 670000000,
    c_rc=2.0 ** -5 * 6500, omega=2.0 ** -31 * PI_GPS * 444444444,
    omega_dot=2.0 ** -43 * PI_GPS * -55000, iode3=45,
    idot=2.0 ** -43 * PI_GPS * 1300)


def test_parity_roundtrip(rng):
    d29 = d30 = 0
    for _ in range(20):
        data = rng.integers(0, 2, 24).astype(np.uint8)
        word = nb.encode_word(data, d29, d30)
        src, n29, n30 = nb.decode_word(word, d29, d30)
        np.testing.assert_array_equal(src, data)
        d29, d30 = n29, n30


def test_parity_detects_bit_flip(rng):
    data = rng.integers(0, 2, 24).astype(np.uint8)
    word = nb.encode_word(data, 0, 0)
    for flip in (0, 7, 24, 29):
        bad = word.copy()
        bad[flip] ^= 1
        src, _, _ = nb.decode_word(bad, 0, 0)
        assert src is None


def test_subframe_encode_frame_sync_decode():
    frames = ne.encode_subframes(EPH, tow_start=17000)
    stream = np.concatenate(frames)
    found = nb.frame_sync(stream)
    assert len(found) == 3
    ids = [ne.subframe_id(f["data"]) for f in found]
    assert ids == [1, 2, 3]
    tows = [ne.tow_count(f["data"]) for f in found]
    assert tows == [17000, 17001, 17002]


def test_inverted_stream_decodes():
    frames = ne.encode_subframes(EPH, tow_start=400)
    stream = 1 - np.concatenate(frames)  # 180-degree phase ambiguity
    found = nb.frame_sync(stream)
    assert len(found) == 3
    assert all(f["inverted"] for f in found)
    got = ne.Ephemeris()
    for f in found:
        got.ingest(f["data"])
    assert got.valid()
    assert got.week == EPH.week


def test_field_roundtrip_all():
    frames = ne.encode_subframes(EPH, tow_start=1234)
    got = ne.Ephemeris()
    for tx in frames:
        data = nb.check_subframe(tx, 0, 0)
        assert data is not None
        got.ingest(data)
    assert got.valid()
    for name in ne.FIELDS:
        np.testing.assert_allclose(
            getattr(got, name), getattr(EPH, name), rtol=0, atol=1e-300,
            err_msg=name)


def test_kepler_vs_closed_form():
    """E - e*sin(E) == M must hold at the solver's tolerance."""
    eph = ne.Ephemeris(sqrt_a=np.sqrt(26560e3), e=0.01, m_0=1.2345,
                       dn=0.0, t_oe=0.0)
    e_k = eph.eccentric_anomaly(100.0)
    a = eph.sqrt_a ** 2
    n = np.sqrt(ne.MU_EARTH / a ** 3)
    m_k = eph.m_0 + n * 100.0
    assert abs((e_k - eph.e * np.sin(e_k)) - m_k) < 1e-9


def test_orbit_radius_and_clock():
    """Orbit radius ~ semi-major axis; clock correction ~ a_f0."""
    x, y, z = EPH.get_xyz(EPH.t_oe)
    r = np.sqrt(x * x + y * y + z * z)
    a = EPH.sqrt_a ** 2
    assert abs(r - a) / a < 0.02  # e is small
    dt = EPH.clock_correction(EPH.t_oc)
    assert abs(dt - (EPH.a_f0 - EPH.t_gd)) < 1e-6


def test_circular_orbit_period():
    """Zero-eccentricity orbit returns to the same point after 2pi/n."""
    eph = ne.Ephemeris(sqrt_a=np.sqrt(26560e3), e=0.0, i_0=0.96,
                       omega_0=0.5, omega=0.3, m_0=0.1, t_oe=0.0)
    a = eph.sqrt_a ** 2
    period = 2 * np.pi / np.sqrt(ne.MU_EARTH / a ** 3)
    x0, y0, z0 = eph.get_xyz(0.0)
    # after one period the satellite is back in inertial space; ECEF
    # rotated by OMEGA_E*period -> compare against the rotation
    x1, y1, z1 = eph.get_xyz(period)
    th = ne.OMEGA_E * period
    xr = x0 * np.cos(th) + y0 * np.sin(th)
    yr = -x0 * np.sin(th) + y0 * np.cos(th)
    assert abs(x1 - xr) < 1.0 and abs(y1 - yr) < 1.0 and abs(z1 - z0) < 1e-6


def test_bit_sync_and_bits(rng):
    nav = 1.0 - 2.0 * rng.integers(0, 2, 30).astype(np.float64)
    offset = 7
    ip = np.repeat(nav, CODES_PER_BIT) * 1000.0
    ip = np.concatenate([rng.normal(0, 1, offset) + 900.0 * np.sign(nav[0]),
                         ip])  # partial first bit
    est = nb.bit_sync(ip + rng.normal(0, 30, len(ip)))
    assert est == offset % CODES_PER_BIT
    bits = nb.bits_from_prompt(ip, est)
    want = (nav[np.sign(nav[0]) == np.sign(nav[0])] < 0).astype(np.uint8)
    np.testing.assert_array_equal(bits[:len(nav)], (nav < 0).astype(np.uint8))


def test_tow_and_week_rollover():
    assert ne.time_from_epoch(10.0, 604790.0) == pytest.approx(20.0)
    assert ne.time_from_epoch(604790.0, 10.0) == pytest.approx(-20.0)


def test_iono_page18_roundtrip():
    eph = ne.Ephemeris(iodc=9, iode2=9, iode3=9)
    eph.alpha = (2.0 ** -30 * 12, 2.0 ** -27 * -3, 2.0 ** -24 * 5,
                 2.0 ** -24 * -1)
    eph.beta = (2.0 ** 11 * 44, 2.0 ** 14 * -2, 2.0 ** 16 * 3,
                2.0 ** 16 * -7)
    frames = ne.encode_subframes(eph, tow_start=100, sids=(4,))
    got = ne.Ephemeris()
    data = nb.check_subframe(frames[0], 0, 0)
    assert data is not None
    sid = got.ingest(data)
    assert sid == 4
    assert got.alpha == pytest.approx(eph.alpha)
    assert got.beta == pytest.approx(eph.beta)


def test_utc_page18_roundtrip_and_leap():
    """Broadcast UTC parameters (page 18 second half): encode -> parity
    -> ingest roundtrip, plus the ICD 20.3.3.5.2.4 effectivity rule.
    The reference never decodes these (c/ephemeris.cpp:70-83 stops at
    beta), so its NMEA-era consumers run 18 s off UTC."""
    eph = ne.Ephemeris(iodc=9, iode2=9, iode3=9)
    eph.a0_utc = 2.0 ** -30 * -1234
    eph.a1_utc = 2.0 ** -50 * 77
    eph.t_ot = 2.0 ** 12 * 143          # 585728 s
    eph.wn_t = 73.0                      # full week 2377 mod 256
    eph.delta_t_ls = 18.0
    eph.wn_lsf = 85.0                    # leap event week (mod 256)
    eph.dn_utc = 7.0
    eph.delta_t_lsf = 19.0
    frames = ne.encode_subframes(eph, tow_start=100, sids=(4,))
    got = ne.Ephemeris()
    data = nb.check_subframe(frames[0], 0, 0)
    assert data is not None
    got.ingest(data)
    assert got.has_utc
    for f in ("a0_utc", "a1_utc", "t_ot", "wn_t", "delta_t_ls",
              "wn_lsf", "dn_utc", "delta_t_lsf"):
        assert getattr(got, f) == pytest.approx(getattr(eph, f)), f

    # effectivity: event at end of day 7 of full week 2389 (85 mod 256)
    assert got.leap_seconds(2380, 0.0) == 18        # well before
    assert got.leap_seconds(2389, 7 * 86400 - 1) == 18  # 1 s before
    assert got.leap_seconds(2389, 7 * 86400) == 19  # at the event
    assert got.leap_seconds(2395, 1000.0) == 19     # after
    # the fractional A0/A1 term is tiny but present
    off = got.utc_offset_s(2380, 586000.0)
    assert abs(off - 18.0) < 1e-5 and off != 18.0
    # no page 18 ingested -> offset is 0 (synthetic-scene default)
    assert ne.Ephemeris().leap_seconds(2380, 0.0) == 0


def test_resolve_week():
    """Mod-1024 week disambiguation (the reference stores the raw
    field, c/ephemeris.cpp:36-44, and aliases dates into 1980+w)."""
    # pivot heuristic: smallest full week >= 2048 (the 2019 rollover)
    assert ne.resolve_week(297) == 2345          # 2024-era capture
    assert ne.resolve_week(1023) == 2047 + 1024  # wraps up past pivot
    assert ne.resolve_week(0) == 2048
    # already-full weeks pass through (synthetic scenes use them)
    assert ne.resolve_week(2345) == 2345
    # a wall-clock hint picks the nearest congruent week instead
    assert ne.resolve_week(297, hint_week=2400) == 2345
    assert ne.resolve_week(297, hint_week=3400) == 3369
    assert ne.resolve_week(900, hint_week=1000) == 900   # pre-rollover


def test_iono_wrong_page_ignored():
    eph = ne.Ephemeris()
    eph.alpha = (1e-8,) * 4
    frames = ne.encode_subframes(eph, tow_start=100, sids=(4,))
    # corrupt the sv-id so it is not page 18
    got = ne.Ephemeris()
    data = nb.check_subframe(frames[0], 0, 0)
    data = data.copy()
    data[2 * 24 + 4] ^= 1  # flip an sv-id bit (word 3 bit 5)
    got.ingest(data)
    assert got.alpha == (0.0, 0.0, 0.0, 0.0)


def test_eccentric_anomaly_invalid_ephemeris_raises():
    """Empty ephemeris (sqrt_a=0) must raise, not hang forever."""
    from tpu_gnss.nav.ephemeris import Ephemeris
    with pytest.raises(ValueError, match="Kepler"):
        Ephemeris().get_xyz(0.0)
    with pytest.raises(ValueError, match="Kepler"):
        Ephemeris().clock_correction(float("nan"))


def test_period_grid_bit_sync_immune_to_code_creep():
    """Drift-immunity regression (the 300 s soak bug): with Doppler code
    creep walking the epoch grid across the code-period grid, an
    epoch-indexed bit offset silently shifts by one period mid-stream
    (a +-1 ms / +-300 km transmit-time error); the period-indexed grid
    (bit_sync_periods / bits_from_prompt_periods) must decode the same
    bits AND the same exact edge chip counts throughout."""
    rng = np.random.default_rng(7)
    n_ep = 8000                       # 8 s of epochs
    creep = 9e-4                      # chips/chip: ~0.9 chips/ms -> walks
                                      # ~7 periods across the stream
    r_true = 7                        # bit edges at periods r_true + 20k
    phase0 = 300.0                    # chips at epoch 0
    # tracked chip integral: nominal 1023/epoch plus creep
    chips = phase0 + np.arange(n_ep) * (1023.0 * (1.0 + creep))
    periods = np.round(chips / 1023.0).astype(np.int64)
    true_bits = rng.integers(0, 2, 600).astype(np.uint8)
    # prompt sign per epoch from the PERIOD-grid truth
    b_of_e = (periods - r_true) // 20
    b_of_e -= b_of_e.min()
    ip = (1.0 - 2.0 * true_bits[np.clip(b_of_e, 0, len(true_bits) - 1)]
          ) * 1000.0

    r_est = nb.bit_sync_periods(ip, periods)
    assert r_est == r_true % 20
    got, b_raw0 = nb.bits_from_prompt_periods(ip, periods, r_est)
    # decoded bits must match the truth with NO mid-stream slip
    first_truth = (periods[0] - r_true) // 20 - b_of_e.min() + (
        b_raw0 - (periods[0] - r_est) // 20)
    span = min(len(got), 500)
    # align: bits[i] corresponds to raw bit b_raw0 + i on the period grid
    want = true_bits[(np.arange(span) + b_raw0
                      - ((periods[0] - r_true) // 20 - b_of_e.min()))]
    assert np.array_equal(got[:span], want), "bit slip across code creep"
    # edge chip counts are exact period multiples on the 20-grid
    edges = (r_est + 20 * (b_raw0 + np.arange(span))) * 1023.0
    assert np.all(np.abs(edges / 1023.0 % 20 - r_est % 20) < 1e-9)


def test_partial_anchor_from_preamble_how():
    """partial_anchors: a preamble + parity-valid TLM/HOW at the stream
    tail yields the TOW anchor before the full subframe exists; corrupt
    parity or a complete subframe in the buffer yields nothing."""
    from tpu_gnss.nav import bits as nb
    from tpu_gnss.nav.ephemeris import encode_subframes
    from .test_pvt import make_constellation

    eph = make_constellation(1)[0]
    frames = encode_subframes(eph, tow_start=1000, sids=(1, 2))
    stream = np.concatenate(frames)
    # cut 70 bits into subframe 2: preamble + TLM + HOW + a bit more
    cut = 300 + 70
    anchors = nb.partial_anchors(stream[:cut])
    assert len(anchors) == 1
    assert anchors[0]["start"] == 300
    assert anchors[0]["tow"] == 1001  # HOW names the NEXT subframe start
    # parity corruption kills it
    bad = stream[:cut].copy()
    bad[300 + 40] ^= 1
    assert nb.partial_anchors(bad) == []
    # nothing reported where the full subframe fits (frame_sync's job)
    assert nb.partial_anchors(stream[:600]) == []
