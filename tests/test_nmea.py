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
