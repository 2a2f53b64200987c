"""PVT solver tests on synthetic constellations at known positions."""

import numpy as np
import pytest

from tpu_gnss.constants import OMEGA_E, SPEED_OF_LIGHT, CHIP_RATE_HZ
from tpu_gnss.nav.ephemeris import Ephemeris
from tpu_gnss.pvt import solve as ps
from tpu_gnss.signal import cacode


def make_constellation(n=6, t_oe=302400.0):
    """GPS-like orbits spread in plane/anomaly, mild clock terms."""
    ephs = []
    for k in range(n):
        ephs.append(Ephemeris(
            week=900, iodc=10 + k, iode2=10 + k, iode3=10 + k,
            sqrt_a=np.sqrt(26560e3), e=0.01 + 0.001 * k,
            i_0=0.958, omega_0=k * 2 * np.pi / n, omega=0.3 * k,
            m_0=0.5 + k * 1.1, dn=4.3e-9, idot=2e-10,
            omega_dot=-8.0e-9, c_rs=12.5, c_rc=200.0, c_uc=1e-6,
            c_us=5e-6, c_ic=-5e-8, c_is=9e-8,
            t_oe=t_oe, t_oc=t_oe, a_f0=1e-4 * (k - 2), a_f1=1e-11,
            t_gd=4.6e-9))
    return ephs


def gen_measurements(ephs, rx_ecef, t_rx):
    """Light-time-consistent uncorrected transmit times."""
    rx = np.asarray(rx_ecef)
    t_tx_raw = []
    for eph in ephs:
        t_tx = t_rx - 0.075
        for _ in range(6):
            svp = np.array(eph.get_xyz(t_tx))
            th = (t_tx - t_rx) * OMEGA_E
            ct, st = np.cos(th), np.sin(th)
            eci = np.array([svp[0] * ct - svp[1] * st,
                            svp[0] * st + svp[1] * ct, svp[2]])
            r = np.linalg.norm(rx - eci)
            t_tx = t_rx - r / SPEED_OF_LIGHT
        # invert the SV clock correction: raw - corr(raw) = t_tx
        raw = t_tx
        for _ in range(4):
            raw = t_tx + eph.clock_correction(raw)
        t_tx_raw.append(raw)
    return np.array(t_tx_raw)


TRUTH_LLA = (52.95, -1.15, 48.0)  # Nottingham-ish
T_RX = 302500.0


def test_solve_recovers_position():
    ephs = make_constellation(6)
    rx = ps.geodetic_to_ecef(*TRUTH_LLA)
    t_tx = gen_measurements(ephs, rx, T_RX)
    sol = ps.solve_position(t_tx, ephs)
    assert sol.converged
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    assert err < 2.0, f"position error {err:.2f} m"
    assert abs(sol.t_rx - T_RX) < 1e-8
    assert sol.iterations <= 8  # reference reports 5-6 typical
    assert abs(sol.lat_deg - TRUTH_LLA[0]) < 1e-4
    assert abs(sol.lon_deg - TRUTH_LLA[1]) < 1e-4
    assert abs(sol.alt_m - TRUTH_LLA[2]) < 5.0


def test_weights_prefer_strong_channels():
    """A corrupted weak channel must not wreck a weighted solve."""
    ephs = make_constellation(7)
    rx = ps.geodetic_to_ecef(*TRUTH_LLA)
    t_tx = gen_measurements(ephs, rx, T_RX)
    t_tx[6] += 3e-7  # ~90 m error on one channel
    w = np.array([1.0] * 6 + [1e-3])
    sol = ps.solve_position(t_tx, ephs, w)
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    assert err < 3.0
    sol_unw = ps.solve_position(t_tx, ephs)
    err_unw = np.linalg.norm(
        np.array([sol_unw.x, sol_unw.y, sol_unw.z]) - np.array(rx))
    assert err < err_unw


def test_snapshot_transmit_time_roundtrip():
    eph = make_constellation(4)[0]
    # t = tow*6 + bits/50 + ms*1e-3 + chips/CPS + phase
    snap = ps.Snapshot(eph=eph, tow=50000, bits=17, ms=7,
                       g1=int(cacode.g1_state_table()[555]),
                       ca_phase=13.0)
    want = (50000 * 6 + 17 / 50.0 + 7e-3 + 555 / CHIP_RATE_HZ
            + 13.0 * 2 ** -6 / CHIP_RATE_HZ)
    assert snap.transmit_time() == pytest.approx(want, abs=1e-12)


def test_solve_snapshots_flow():
    ephs = make_constellation(5)
    rx = ps.geodetic_to_ecef(*TRUTH_LLA)
    t_tx = gen_measurements(ephs, rx, T_RX)
    snaps = []
    for t, eph in zip(t_tx, ephs):
        tow = int(t // 6)
        rem = t - tow * 6
        bits = int(rem * 50)
        rem -= bits / 50.0
        ms = int(rem * 1000)
        rem -= ms * 1e-3
        chips = int(rem * CHIP_RATE_HZ)
        rem -= chips / CHIP_RATE_HZ
        phase = rem * CHIP_RATE_HZ * 64
        snaps.append(ps.Snapshot(
            eph=eph, power=1.0, tow=tow, bits=bits, ms=ms,
            g1=int(cacode.g1_state_table()[chips % 1023]),
            chips=chips, ca_phase=phase))
    # chips>=1023 cannot come from a G1 readout; keep value consistent
    for s in snaps:
        if s.chips >= 1023:
            s.g1 = None
    sol = ps.solve_snapshots(snaps)
    assert sol is not None
    err = np.linalg.norm(
        np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    assert err < 2.0


def test_too_few_channels():
    ephs = make_constellation(3)
    with pytest.raises(ValueError):
        ps.solve_position(np.zeros(3) + 302400.0, ephs)
    assert ps.solve_snapshots([]) is None


def test_invalid_ephemeris_dropped():
    ephs = make_constellation(5)
    ephs[0].iode3 = 99  # inconsistent IOD -> invalid
    snaps = [ps.Snapshot(eph=e, tow=50000, chips=100) for e in ephs]
    assert ps.solve_snapshots(snaps) is None or True  # must not crash


def test_latlonalt_roundtrip():
    for lla in [(0.0, 0.0, 100.0), (45.0, 120.0, 1000.0),
                (-33.9, 18.4, 7.0), (52.95, -1.15, 48.0)]:
        xyz = ps.geodetic_to_ecef(*lla)
        lat, lon, alt = ps.lat_lon_alt(*xyz)
        assert abs(np.degrees(lat) - lla[0]) < 1e-6
        assert abs(np.degrees(lon) - lla[1]) < 1e-6
        assert abs(alt - lla[2]) < 0.01


def test_iono_correction_improves_fix():
    """Measurements with modeled iono delay: corrected solve is closer."""
    from tpu_gnss.constants import SPEED_OF_LIGHT
    from tpu_gnss.pvt.iono import iono_range_correction_m
    alpha = (1.1176e-8, 7.4506e-9, -5.9605e-8, -5.9605e-8)
    beta = (90112.0, 0.0, -196610.0, -65536.0)
    ephs = make_constellation(6)
    for e in ephs:
        e.alpha, e.beta = alpha, beta
    rx = np.array(ps.geodetic_to_ecef(*TRUTH_LLA))
    lat, lon = np.radians(TRUTH_LLA[0]), np.radians(TRUTH_LLA[1])
    t_tx = gen_measurements(ephs, rx, T_RX)
    # delay each measurement by the Klobuchar model: signal decodes the
    # same t_tx but arrives iono/c later -> receiver snapshot catches an
    # EARLIER transmit time by the same amount
    delays = np.array([
        iono_range_correction_m(alpha, beta, rx, e.get_xyz(t), lat, lon, t)
        for e, t in zip(ephs, t_tx)]) / SPEED_OF_LIGHT
    t_tx_meas = t_tx - delays
    plain = ps.solve_position(t_tx_meas, ephs)
    corr = ps.solve_position(t_tx_meas, ephs, apply_iono=True)
    err_plain = np.linalg.norm(np.array([plain.x, plain.y, plain.z]) - rx)
    err_corr = np.linalg.norm(np.array([corr.x, corr.y, corr.z]) - rx)
    assert err_corr < err_plain
    assert err_corr < 3.0, f"corrected error {err_corr:.2f} m"


def test_lat_lon_alt_antimeridian():
    """lon at (x<0, y=0) is 180 deg, not 0 (half-angle atan2 quirk)."""
    from tpu_gnss.pvt.solve import lat_lon_alt, WGS84_A
    lat, lon, alt = lat_lon_alt(-WGS84_A, 0.0, 0.0)
    assert abs(np.degrees(lon)) == pytest.approx(180.0, abs=1e-9)
    assert abs(np.degrees(lat)) < 1e-6 and abs(alt) < 1e-3


# ---------------------------------------------------------------------------
# Doppler velocity solve
# ---------------------------------------------------------------------------

def doppler_oracle(eph, rx_of_t, t_rx, drift=0.0, h=0.5):
    """Measured carrier Doppler by numeric differentiation of the SV-clock
    carrier pseudorange.  Works on ``g(t) = t_sv_raw(t) - t`` (magnitude
    ~1e-4 s) so float64 quantization of absolute times never enters; the
    oracle is good to ~1e-5 Hz."""
    from tpu_gnss.constants import L1_HZ

    def g(t):
        rx = np.asarray(rx_of_t(t))
        t_tx = t - 0.075
        for _ in range(8):
            svp = np.array(eph.get_xyz(t_tx))
            th = (t_tx - t) * OMEGA_E
            ct, st = np.cos(th), np.sin(th)
            eci = np.array([svp[0] * ct - svp[1] * st,
                            svp[0] * st + svp[1] * ct, svp[2]])
            rho = np.linalg.norm(rx - eci)
            t_tx = t - rho / SPEED_OF_LIGHT
        gmt = -rho / SPEED_OF_LIGHT
        for _ in range(4):
            gmt = -rho / SPEED_OF_LIGHT + eph.clock_correction(t + gmt)
        return gmt

    gdot = (g(t_rx + h) - g(t_rx - h)) / (2.0 * h)
    return L1_HZ * ((1.0 + gdot) / (1.0 + drift) - 1.0)


def enu_to_ecef_vel(v_enu, lat_deg, lon_deg):
    lat, lon = np.radians(lat_deg), np.radians(lon_deg)
    sl, cl = np.sin(lon), np.cos(lon)
    sp, cp = np.sin(lat), np.cos(lat)
    e = np.array([-sl, cl, 0.0])
    n = np.array([-sp * cl, -sp * sl, cp])
    u = np.array([cp * cl, cp * sl, sp])
    return v_enu[0] * e + v_enu[1] * n + v_enu[2] * u


def test_solve_velocity_recovers_velocity():
    ephs = make_constellation(6)
    rx0 = np.array(ps.geodetic_to_ecef(*TRUTH_LLA))
    v_enu = np.array([12.0, -5.0, 1.5])
    v_ecef = enu_to_ecef_vel(v_enu, TRUTH_LLA[0], TRUTH_LLA[1])
    drift = 5e-8  # 50 ns/s receiver clock drift (typical TCXO)
    rx_of_t = lambda t: rx0 + v_ecef * (t - T_RX)
    dops = np.array([doppler_oracle(e, rx_of_t, T_RX, drift)
                     for e in ephs])
    t_tx = gen_measurements(ephs, rx0, T_RX)
    vel = ps.solve_velocity(rx0, T_RX, t_tx, ephs, dops)
    got = np.array([vel.vx, vel.vy, vel.vz])
    err = np.linalg.norm(got - v_ecef)
    assert err < 0.02, f"velocity error {err * 100:.2f} cm/s"
    assert abs(vel.ve - v_enu[0]) < 0.02
    assert abs(vel.vn - v_enu[1]) < 0.02
    assert abs(vel.vu - v_enu[2]) < 0.02
    assert vel.speed_mps == pytest.approx(np.hypot(12.0, -5.0), abs=0.02)
    truth_course = np.degrees(np.arctan2(12.0, -5.0)) % 360.0
    assert vel.course_deg == pytest.approx(truth_course, abs=0.2)
    assert vel.clk_drift == pytest.approx(drift, abs=2e-11)


def test_solve_velocity_static_receiver():
    ephs = make_constellation(5)
    rx0 = np.array(ps.geodetic_to_ecef(*TRUTH_LLA))
    dops = np.array([doppler_oracle(e, lambda t: rx0, T_RX)
                     for e in ephs])
    # sanity: geometry produces real Doppler, not all ~0
    assert np.max(np.abs(dops)) > 100.0
    t_tx = gen_measurements(ephs, rx0, T_RX)
    vel = ps.solve_velocity(rx0, T_RX, t_tx, ephs, dops)
    assert np.linalg.norm([vel.vx, vel.vy, vel.vz]) < 0.01
    assert vel.speed_mps < 0.01
    assert abs(vel.clk_drift) < 1e-11


def test_sv_velocity_matches_position_derivative():
    """get_velocity against an independent 7-point stencil at h=8 s."""
    eph = make_constellation(1)[0]
    t = T_RX
    v = np.array(eph.get_velocity(t))
    h = 8.0
    c7 = np.array([-1.0, 9.0, -45.0, 0.0, 45.0, -9.0, 1.0]) / (60.0 * h)
    p = np.array([eph.get_xyz(t + k * h) for k in range(-3, 4)])
    v_ref = c7 @ p
    assert np.linalg.norm(v - v_ref) < 1e-4
    assert 2000.0 < np.linalg.norm(v) < 5000.0  # GPS orbital speed range


def test_raim_excludes_slipped_channel():
    """A channel with a whole-code-period pseudorange slip (~300 km) is
    detected and excluded; the fix recovers to meters."""
    ephs = make_constellation(6)
    rx = ps.geodetic_to_ecef(52.95, -1.15, 48.0)
    t_tx = gen_measurements(ephs, rx, T_RX)
    t_tx[2] += 1e-3                      # one code period late

    plain = ps.solve_position(t_tx, ephs)
    assert plain.converged
    assert plain.residual_rms_m > 1e3, "premise: slip must blow residuals"

    sol, excl = ps.solve_position_raim(t_tx, ephs)
    assert sol is not None and excl == 2
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - rx)
    assert err < 10.0, f"post-exclusion error {err:.1f} m"


def test_raim_passthrough_when_consistent():
    """Clean measurements: no exclusion, same solution as plain solve."""
    ephs = make_constellation(5)
    rx = ps.geodetic_to_ecef(52.95, -1.15, 48.0)
    t_tx = gen_measurements(ephs, rx, T_RX)
    sol, excl = ps.solve_position_raim(t_tx, ephs)
    assert excl is None
    want = ps.solve_position(t_tx, ephs)
    assert abs(sol.x - want.x) < 1e-6


def test_raim_refuses_unresolvable():
    """TWO slipped channels of six: no single exclusion restores
    consistency -> no fix at all (refusing to report a wrong position
    is the integrity contract).  NB with exactly 4 channels the solve
    is exactly determined (zero redundancy), so residual-based
    detection is impossible — the textbook RAIM bound (detection needs
    >=5, exclusion >=6)."""
    ephs = make_constellation(6)
    rx = ps.geodetic_to_ecef(52.95, -1.15, 48.0)
    t_tx = gen_measurements(ephs, rx, T_RX)
    t_tx[1] += 1e-3
    t_tx[4] -= 1e-3
    sol, excl = ps.solve_position_raim(t_tx, ephs)
    assert sol is None and excl is None


def test_soft_fault_exclusion_from_residual_baseline():
    """Receiver-level adaptive RAIM (round-4 soak attribution): a
    ~12 m single-channel pseudorange glitch sits far below the gross
    500 m gate but spikes the post-fit residual to ~6x the receiver's
    own baseline — the soft layer must exclude that channel and bring
    the fix back to the clean level."""
    from tpu_gnss.config import ReceiverConfig
    from tpu_gnss.receiver import Receiver

    ephs = make_constellation(6)
    rx = np.array(ps.geodetic_to_ecef(52.95, -1.15, 48.0))
    t_tx = gen_measurements(ephs, rx, T_RX)
    recv = Receiver(ReceiverConfig(fs=2.048e6, fc=0.512e6, max_fo=5000.0,
                                   fft_len=4096))
    w = np.ones(6)
    rng = np.random.default_rng(3)
    for _ in range(10):   # clean solves build the residual baseline
        noisy = t_tx + rng.normal(0.0, 1.5e-9, 6)   # ~0.5 m noise
        sol, excl = recv._integrity_solve(noisy, ephs, w)
        assert sol is not None and excl is None
    clean_err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - rx)

    bad = t_tx + rng.normal(0.0, 1.5e-9, 6)
    bad[3] += 4e-8                                  # +12 m fault
    sol_b, excl_b = recv._integrity_solve(bad, ephs, w)
    assert excl_b == 3, "soft layer failed to exclude the glitched channel"
    err_b = np.linalg.norm(np.array([sol_b.x, sol_b.y, sol_b.z]) - rx)
    assert err_b < clean_err + 2.0, (err_b, clean_err)

    # availability: with no consistent subset (two faults) the soft
    # layer keeps the ORIGINAL hard-gate fix rather than refusing
    bad2 = t_tx + rng.normal(0.0, 1.5e-9, 6)
    bad2[1] += 4e-8
    bad2[4] -= 4e-8
    sol_c, excl_c = recv._integrity_solve(bad2, ephs, w)
    assert sol_c is not None
