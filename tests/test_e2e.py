"""End-to-end receiver test: synthetic RF scene in, position fix out.

The full-chain oracle the reference never had in software: a consistent
multi-SV scene (light-time-exact code phases, parity-valid NAV streams,
Doppler-coherent carriers) is synthesized at a known receiver position,
and the complete pipeline — acquisition, tracking, bit/frame sync,
ephemeris decode, PVT — must recover that position.
"""

import numpy as np
import pytest

from tpu_gnss.config import ReceiverConfig
from tpu_gnss.constants import OMEGA_E, SPEED_OF_LIGHT
from tpu_gnss.nav.ephemeris import encode_subframes
from tpu_gnss.pvt import solve as ps
from tpu_gnss.receiver import Receiver
from tpu_gnss.signal import synth

from .test_pvt import make_constellation

FS = 2.048e6
TRUTH_LLA = (52.95, -1.15, 48.0)
T_OE = 302400.0


def sv_time_knots(eph, rx_ecef, t_rx_knots):
    """Light-time-exact raw SV times at receiver-time knots.

    ``rx_ecef``: ``[3]`` (static receiver) or ``[len(t_rx_knots), 3]``
    (receiver position at each knot — moving-receiver scenes).
    """
    rx_arr = np.asarray(rx_ecef, np.float64)
    out = []
    for i, t_rx in enumerate(t_rx_knots):
        rx_i = rx_arr if rx_arr.ndim == 1 else rx_arr[i]
        t_tx = t_rx - 0.075
        for _ in range(6):
            svp = np.array(eph.get_xyz(t_tx))
            th = (t_tx - t_rx) * OMEGA_E
            ct, st = np.cos(th), np.sin(th)
            eci = np.array([svp[0] * ct - svp[1] * st,
                            svp[0] * st + svp[1] * ct, svp[2]])
            r = np.linalg.norm(rx_i - eci)
            t_tx = t_rx - r / SPEED_OF_LIGHT
        raw = t_tx
        for _ in range(4):
            raw = t_tx + eph.clock_correction(raw)
        out.append(raw)
    return np.array(out)


def enu_to_ecef_matrix(lat_deg: float, lon_deg: float) -> np.ndarray:
    """Columns are the local East/North/Up unit vectors in ECEF."""
    from tpu_gnss.pvt.iono import ecef_to_enu
    lat, lon = np.radians(lat_deg), np.radians(lon_deg)
    r = np.column_stack([ecef_to_enu(None, lat, lon, e)
                         for e in np.eye(3)])
    return r.T   # ecef_to_enu's matrix maps ECEF->ENU; transpose inverts


@pytest.fixture(scope="module")
def scene():
    """One 20 s consistent 6-SV scene shared by the e2e tests."""
    return build_scene()


def build_scene(duration: float = 20.0, n_sv: int = 6, noise: float = 0.7,
                seed: int = 42, dropout=None, degrade=None,
                rx_vel_enu=None, doppler_ramp_hz_s: float = 0.0,
                leap_s: float = 0.0):
    """Consistent multi-SV scene: (iq, ephs, rx_ecef).

    Shared by the e2e tests and tools/e2e_payload.py /
    tools/soak_payload.py (the on-hardware demos) so all validate the
    identical scene recipe.  The NAV stream repeats the (4,1,2,3)
    subframe cycle for as long as ``duration`` needs.

    ``dropout``: optional ``(sv_index, t0_s, t1_s)`` — that SV's signal
    vanishes over [t0, t1) of receiver time (antenna blockage), for
    watchdog / re-acquisition soaks.

    ``degrade``: optional ``(sv_index, t0_s, gain)`` — that SV's
    amplitude drops to ``gain`` from t0 on (deep fade: still present,
    but C/N0 collapses and tracking slips), for solver quality-gate
    tests.

    ``rx_vel_enu``: optional ``[3]`` East/North/Up receiver velocity
    (m/s), constant over the scene.  The light-time iteration sees the
    moving position at every knot, so code phase, carrier Doppler and
    NAV timing all carry the motion consistently — the truth for
    velocity-solve / RMC/VTG end-to-end tests.  ``rx_ecef`` in the
    return stays the t=0 position; truth at scene time t is
    ``rx + enu_to_ecef_matrix(lat, lon) @ rx_vel_enu * t``.

    ``doppler_ramp_hz_s``: optional common carrier-Doppler ramp (Hz/s at
    L1), modeling receiver clock drift rate / acceleration for
    high-dynamics stress.  Implemented as a quadratic receiver clock
    term: d(t_rx_true)/dt = 1 + ramp/L1 * t, which perturbs every SV's
    observed Doppler by ``ramp * t`` while keeping the scene physically
    consistent (it is exactly an accelerating receiver oscillator).
    """
    rng = np.random.default_rng(seed)
    ephs = make_constellation(n_sv, t_oe=T_OE)
    if leap_s:
        # broadcast GPS-UTC leap seconds in the page-18 UTC half
        # (nav/ephemeris.UTC_FIELDS); the event is placed in the past
        # so leap_seconds() returns ``leap_s`` throughout the scene
        for e in ephs:
            e.delta_t_ls = float(leap_s)
            e.delta_t_lsf = float(leap_s)
            e.wn_lsf = 1.0
            e.dn_utc = 1.0
    rx = ps.geodetic_to_ecef(*TRUTH_LLA)
    vel_ecef = None
    if rx_vel_enu is not None:
        vel_ecef = enu_to_ecef_matrix(TRUTH_LLA[0], TRUTH_LLA[1]) \
            @ np.asarray(rx_vel_enu, np.float64)

    # Receiver timeline: `duration` s starting t_rx0.  Each SV's NAV
    # stream cycles [sf4, sf1, sf2, sf3]; t_rx0 is chosen so t_sv0 lands
    # ~1.5 s before the next subframe boundary: the receiver locks
    # during the sf4 filler, then catches complete subframes 1-3.
    n = int(duration * FS)
    t_knots = np.linspace(0, duration, max(41, int(3 * duration)))
    fit_deg = max(3, int(duration // 12))

    # t_sv ~= t_rx - 75 ms; 302488.525 is 1.475 s before the 302490 grid
    t_rx0 = T_OE + 88.6
    n_sf = int(np.ceil(duration / 6.0)) + 2
    sids = tuple(([4, 1, 2, 3] * ((n_sf + 3) // 4))[:n_sf])
    # Segmented synthesis (bit-identical to whole-stream: explicit
    # global phase refs + elementwise math) bounds peak RSS at ~seg_n
    # float64 temporaries instead of ~10 full-capture ones — a 60 s
    # soak scene generates in well under 1 GB instead of >10 GB.
    iq = np.zeros(n, dtype=np.complex64)
    seg_n = int(2.0 * FS)
    # receiver-clock acceleration: sample n (receiver time t) sees the
    # field at true time t + 0.5*(ramp/L1)*t^2 — every SV's Doppler
    # ramps by ``doppler_ramp_hz_s`` Hz/s, physically consistently
    knots_t = t_rx0 + t_knots
    if doppler_ramp_hz_s:
        from tpu_gnss.constants import L1_HZ
        knots_t = knots_t + 0.5 * (doppler_ramp_hz_s / L1_HZ) * t_knots ** 2
    rx_np = np.asarray(rx, np.float64)
    rx_knots = (rx_np if vel_ecef is None
                else rx_np[None, :] + np.outer(t_knots, vel_ecef))
    for k, eph in enumerate(ephs):
        tsv_k = sv_time_knots(eph, rx_knots, knots_t)
        if duration > 60.0:
            # one global polynomial goes ill-conditioned on long scenes
            # (deg = duration/12: RankWarning at 600 s); a cubic spline
            # over the 1/3 s knot grid is exact to far below a ns for
            # SV-time curvature at ANY duration
            from scipy.interpolate import CubicSpline
            poly = CubicSpline(t_knots, tsv_k)
        else:
            poly = np.polynomial.Polynomial.fit(t_knots, tsv_k,
                                                deg=fit_deg)
        tsv0 = float(poly(0.0))
        # stream origin: the subframe boundary below t_sv0 (sf4 filler
        # occupies [sf0, sf0+6); t_sv0 lands ~4.5 s into it)
        sf0 = 6.0 * np.floor(tsv0 / 6.0)
        tow0 = int(sf0 / 6.0) + 1
        frames = encode_subframes(eph, tow_start=tow0, sids=sids)
        stream = np.concatenate(frames)
        for s0 in range(0, n, seg_n):
            s1 = min(s0 + seg_n, n)
            t = np.arange(s0, s1, dtype=np.float64) / FS
            sig = synth.synth_from_sv_time(
                eph_prn(k), poly(t), stream, sf0, FS, amplitude=1.0,
                t_rx=t, t_rx_ref=0.0, t_sv_ref=tsv0)
            if dropout is not None and dropout[0] == k:
                a = max(int(dropout[1] * FS), s0) - s0
                b = max(int(dropout[2] * FS), s0) - s0
                sig[a:b] = 0.0
            if degrade is not None and degrade[0] == k:
                a = min(max(int(degrade[1] * FS), s0) - s0, s1 - s0)
                sig[a:] *= degrade[2]
            iq[s0:s1] += sig
    # chunked draws == one full draw (Generator normals are a sequential
    # stream); real rail fully first, then imag, preserving the exact
    # noise realization of the historical whole-array version
    for rail in (1.0, 1.0j):
        for s0 in range(0, n, seg_n):
            s1 = min(s0 + seg_n, n)
            v = rng.standard_normal(s1 - s0)
            iq[s0:s1] += (rail * (noise / np.sqrt(2)) * v
                          ).astype(np.complex64)
    return iq, ephs, rx


@pytest.mark.slow
def test_full_chain_position_fix(scene):
    iq, ephs, rx = scene
    cfg = ReceiverConfig(fs=FS, fc=FS / 4, max_fo=5000.0, fft_len=4096,
                         snr_threshold=20.0)
    recv = Receiver(cfg)
    result = recv.process_iq(iq)

    assert len(result.detections) >= 4, result.detections
    decoded = [r for r in result.channels if r.eph.valid()]
    assert len(decoded) >= 4, f"only {len(decoded)} ephemerides decoded"
    assert result.solutions, "no PVT fix produced"
    # periodic 4 s cadence must produce fixes THROUGHOUT the capture,
    # not just at the end (regression: solve anchored on the capture's
    # final subframe skipped every earlier snapshot)
    assert len(result.solutions) >= 4, (
        f"only {len(result.solutions)} fixes from a 20 s capture")
    sol = result.solutions[-1]
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    # deviation-form code NCO (float32-exact transmit-time chip
    # integral) + carrier-smoothed code phase: observed ~1 m on this
    # scene (was 11-46 m and growing ~1.5 m/s with the absolute-rate
    # NCO, ~1-5 m unsmoothed)
    assert err < 8.0, f"position error {err:.1f} m"
    # receiver time recovered to ~ the code-tracking jitter level
    # t_rx at the snapshot epoch: truth = t_rx0 + epoch*1ms
    # (validated implicitly by err; explicit check on lat/lon)
    assert abs(sol.lat_deg - TRUTH_LLA[0]) < 0.01
    assert abs(sol.lon_deg - TRUTH_LLA[1]) < 0.01
    # Doppler velocity solve: the scene's receiver is static, so the
    # attached velocity must be ~0 up to PLL jitter
    assert sol.vel is not None, "velocity not attached to the fix"
    assert sol.vel.speed_mps < 1.0, f"static scene: {sol.vel.speed_mps} m/s"
    assert abs(sol.vel.vu) < 2.0


def eph_prn(k: int) -> int:
    """PRN assignment for constellation index k."""
    return k + 2  # PRNs 2..7


@pytest.mark.slow
def test_warm_start_short_capture(scene):
    """With checkpointed ephemerides, 8 s of capture yields a fix
    (cold needs ~20 s for subframes 1-3)."""
    iq, ephs, rx = scene
    from tpu_gnss.io.stream import SampleSource

    class ArraySource(SampleSource):
        def __init__(self, data, fs):
            self.data, self.fs = data, fs
        def blocks(self, block_len):
            for i in range(0, len(self.data) - block_len + 1, block_len):
                yield self.data[i:i + block_len]

    warm = {k + 2: e for k, e in enumerate(ephs)}
    cfg = ReceiverConfig(fs=FS, fc=FS / 4, max_fo=5000.0, fft_len=4096,
                         snr_threshold=20.0)
    recv = Receiver(cfg)
    short = iq[: int(8.0 * FS)]
    cold = recv.process_iq(short)
    assert not cold.solutions, "cold start cannot fix in 8 s"
    warm_res = Receiver(cfg).process_source(
        ArraySource(short, FS), warm_ephemerides=warm)
    assert warm_res.solutions, "warm start must fix within 8 s"
    sol = warm_res.solutions[-1]
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    assert err < 150.0, f"warm-start position error {err:.1f} m"


@pytest.mark.slow
def test_full_chain_from_1bit_if(scene, tmp_path):
    """Reference-style input path: 1-bit hard-limited IF capture file ->
    FileSource1Bit -> full receiver -> fix."""
    iq, ephs, rx = scene
    from tpu_gnss.io import loaders
    from tpu_gnss.io.stream import FileSource1Bit
    from tpu_gnss.signal.synth import baseband_to_1bit_if

    fc = FS / 4
    bits = baseband_to_1bit_if(iq, fc, FS)
    path = tmp_path / "cap_1bit.bin"
    path.write_bytes(loaders.pack_1bit(bits))

    cfg = ReceiverConfig(fs=FS, fc=fc, max_fo=5000.0, fft_len=4096,
                         snr_threshold=17.0)
    recv = Receiver(cfg)
    res = recv.process_source(FileSource1Bit(str(path), cfg))
    assert len(res.detections) >= 4, res.detections
    decoded = [r for r in res.channels if r.eph.valid()]
    assert len(decoded) >= 4, f"only {len(decoded)} ephemerides decoded"
    assert res.solutions, "no fix through the 1-bit chain"
    sol = res.solutions[-1]
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    assert err < 60.0, f"position error {err:.1f} m through 1-bit front end"


@pytest.mark.slow
def test_fix_count_chunk_size_invariant(scene, tmp_path):
    """The solve cadence is epoch-driven, never ingest-chunk-driven.

    The reference fixes every 4 s of signal time regardless of how the
    samples arrive (c/solve.cpp:297-302, a wall-clock loop); here the
    same capture must yield the IDENTICAL fix count at every chunk
    size.  Regression for the BENCH_e2e ``int4_chunk8`` zero-fix row:
    file sources dropped the final partial chunk, so chunk_s=8 on a
    20 s capture lost its last 4 s — and with it the third subframe
    every ephemeris needs.
    """
    iq, ephs, rx = scene
    from tpu_gnss.io import loaders
    from tpu_gnss.io.stream import FileSource1Bit
    from tpu_gnss.signal.synth import baseband_to_1bit_if

    fc = FS / 4
    path = tmp_path / "cap_1bit.bin"
    path.write_bytes(loaders.pack_1bit(baseband_to_1bit_if(iq, fc, FS)))
    cfg = ReceiverConfig(fs=FS, fc=fc, max_fo=5000.0, fft_len=4096,
                         snr_threshold=17.0)
    counts = {}
    for ch_s in (0.5, 1.0, 4.0, 8.0):
        res = Receiver(cfg).process_source(FileSource1Bit(str(path), cfg),
                                           chunk_s=ch_s)
        assert res.solutions, f"no fix at chunk_s={ch_s}"
        sol = res.solutions[-1]
        err = np.linalg.norm(np.array([sol.x, sol.y, sol.z])
                             - np.array(rx))
        assert err < 60.0, f"chunk_s={ch_s}: position error {err:.1f} m"
        counts[ch_s] = len(res.solutions)
    assert len(set(counts.values())) == 1, (
        f"fix count varies with ingest chunk size: {counts}")


@pytest.mark.slow
def test_quality_gate_excludes_degraded_channel():
    """A deep-faded channel (C/N0 collapse, tracking slips) is excluded
    by the C/N0 / Costas-lock solver gate, and the gated fix is at least
    as good as the power-weighted fix that keeps it (VERDICT r2 #6;
    probation analog, reference c/channel.cpp:39,343,363)."""
    deg_idx = 3
    iq, ephs, rx = build_scene(duration=26.0, n_sv=6,
                               degrade=(deg_idx, 20.0, 0.05))
    deg_prn = eph_prn(deg_idx)
    cfg = ReceiverConfig(fs=FS, fc=FS / 4, max_fo=5000.0, fft_len=4096,
                         snr_threshold=20.0)
    # los_power_ratio low so the WATCHDOG does not free the channel —
    # the point is the solver's own gate, not signal-loss handling
    gated = Receiver(cfg, los_power_ratio=0.002,
                     quality_gate=True).process_iq(iq)
    ungated = Receiver(cfg, los_power_ratio=0.002,
                       quality_gate=False).process_iq(iq)

    assert gated.solutions and ungated.solutions
    sg, su = gated.solutions[-1], ungated.solutions[-1]
    assert sg.snap_epoch >= 24000 and su.snap_epoch >= 24000
    # the degraded PRN must be in the ungated solution but gated out
    assert deg_prn in [s["prn"] for s in su.sats], \
        "premise broken: ungated solver no longer sees the faded SV"
    assert deg_prn not in [s["prn"] for s in sg.sats], \
        "quality gate failed to exclude the faded SV"
    err_g = np.linalg.norm(np.array([sg.x, sg.y, sg.z]) - np.array(rx))
    err_u = np.linalg.norm(np.array([su.x, su.y, su.z]) - np.array(rx))
    assert err_g < 10.0, f"gated fix error {err_g:.1f} m"
    assert err_g <= err_u + 0.5, (
        f"gating made the fix worse: {err_g:.1f} vs {err_u:.1f} m")


@pytest.mark.slow
def test_moving_receiver_velocity_e2e():
    """Moving-receiver end-to-end (VERDICT r3 #5): a constant-velocity
    trajectory through the full chain must land in the Doppler velocity
    solve AND in the emitted RMC/VTG sentences — the quantities the
    reference ecosystem validates with commercial receivers
    (reference: python/plot_nmea8-ttyACM0-GPS.py:84-159)."""
    v_enu = np.array([15.0, 8.0, 0.0])     # ~33 kt ground vehicle
    iq, ephs, rx = build_scene(duration=20.0, n_sv=6, rx_vel_enu=v_enu)
    cfg = ReceiverConfig(fs=FS, fc=FS / 4, max_fo=5000.0, fft_len=4096,
                         snr_threshold=20.0)
    res = Receiver(cfg).process_iq(iq)
    assert res.solutions, "no fix from the moving-receiver scene"
    sol = res.solutions[-1]

    # position truth moves with the trajectory
    t_fix = sol.snap_epoch * 1e-3
    rx_t = (np.asarray(rx) +
            enu_to_ecef_matrix(TRUTH_LLA[0], TRUTH_LLA[1]) @ v_enu * t_fix)
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - rx_t)
    assert err < 15.0, f"moving-receiver position error {err:.1f} m"

    # velocity from tracked carrier Doppler
    assert sol.vel is not None, "velocity not attached"
    assert abs(sol.vel.ve - v_enu[0]) < 0.5, sol.vel
    assert abs(sol.vel.vn - v_enu[1]) < 0.5, sol.vel
    assert abs(sol.vel.vu - v_enu[2]) < 1.0, sol.vel
    speed_true = float(np.hypot(v_enu[0], v_enu[1]))
    course_true = float(np.degrees(np.arctan2(v_enu[0], v_enu[1])))
    assert abs(sol.vel.speed_mps - speed_true) < 0.5
    assert abs((sol.vel.course_deg - course_true + 180) % 360 - 180) < 3.0

    # ... and out the NMEA port: RMC/VTG carry speed (knots) + course
    from tpu_gnss.cli import nmea_out
    burst = nmea_out.solution_burst(sol)
    rmc = next(s for s in burst if s.startswith("$GPRMC"))
    vtg = next(s for s in burst if s.startswith("$GPVTG"))
    rmc_f = rmc.split("*")[0].split(",")
    knots, course = float(rmc_f[7]), float(rmc_f[8])
    assert abs(knots - speed_true * 3600.0 / 1852.0) < 1.0
    assert abs((course - course_true + 180) % 360 - 180) < 3.0
    vtg_f = vtg.split("*")[0].split(",")
    assert abs(float(vtg_f[7]) - speed_true * 3.6) < 1.8  # km/h field


@pytest.mark.slow
def test_wide_offset_replay_to_fix(tmp_path):
    """The reference's replay personality end-to-end (VERDICT r3 #4):
    a multi-SV scene through the software RF channel with a 60 kHz
    TX/RX oscillator offset (reference README.md §2.1e: replayed
    captures need max_fo=100000), re-captured as a 1-bit IF file, must
    acquire on the +-100 kHz grid, track with IF-offset-corrected
    seeds, and produce a < 15 m fix."""
    from tpu_gnss.io import loaders
    from tpu_gnss.io.stream import FileSource1Bit
    from tpu_gnss.signal import rfchannel
    from tpu_gnss.signal.synth import baseband_to_1bit_if

    offset_hz = 60e3
    iq, ephs, rx = build_scene(duration=20.0, n_sv=6, noise=0.5)
    rxed = rfchannel.apply_channel(iq, FS, freq_offset_hz=offset_hz,
                                   delay_samples=777.0, gain=1.3)
    fc = FS / 4
    bits = baseband_to_1bit_if(rxed, fc, FS)
    path = tmp_path / "replay_1bit.bin"
    path.write_bytes(loaders.pack_1bit(bits))

    cfg = ReceiverConfig(fs=FS, fc=fc, max_fo=100000.0, fft_len=4096,
                         snr_threshold=17.0)
    recv = Receiver(cfg)
    res = recv.process_source(FileSource1Bit(str(path), cfg))
    assert len(res.detections) >= 4, res.detections
    # every detection carries the common oscillator offset
    meds = np.median([d["doppler_hz"] for d in res.detections])
    assert abs(meds - offset_hz) < 2000.0, meds
    assert abs(recv._if_offset - offset_hz) < 2000.0, \
        "auto IF-offset estimate missed"
    decoded = [r for r in res.channels if r.eph.valid()]
    assert len(decoded) >= 4, f"only {len(decoded)} ephemerides decoded"
    assert res.solutions, "no fix through the wide-offset replay chain"
    sol = res.solutions[-1]
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    assert err < 15.0, f"replay fix error {err:.1f} m"


@pytest.mark.slow
@pytest.mark.parametrize("ramp_hz_s", [5.0])
def test_doppler_ramp_high_dynamics(ramp_hz_s):
    """High-dynamics stress (VERDICT r3 #6): a common carrier-Doppler
    ramp (oscillator drift rate / acceleration upper bound for a
    ground-static sky) must not break lock or the fix at the default
    100 Hz loop-update rate."""
    iq, ephs, rx = build_scene(duration=20.0, n_sv=6,
                               doppler_ramp_hz_s=ramp_hz_s)
    cfg = ReceiverConfig(fs=FS, fc=FS / 4, max_fo=5000.0, fft_len=4096,
                         snr_threshold=20.0)
    res = Receiver(cfg).process_iq(iq)
    assert res.solutions, f"no fix under a {ramp_hz_s} Hz/s Doppler ramp"
    sol = res.solutions[-1]
    assert sol.snap_epoch >= 16000, "late-capture fixes missing (lock lost?)"
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    assert err < 15.0, f"ramp fix error {err:.1f} m"


@pytest.mark.slow
def test_warm_hot_start_fix_from_how_anchor(scene):
    """A warm receiver (checkpointed ephemerides) anchors transmit time
    on a preamble + parity-valid TLM/HOW pair BEFORE the full subframe
    arrives (nav/bits.partial_anchors): 6 s of capture — the first
    complete subframe ends at ~7.5 s of scene time, so full-subframe
    anchoring CANNOT fix here — must already produce a fix."""
    iq, ephs, rx = scene
    warm = {k + 2: e for k, e in enumerate(ephs)}
    cfg = ReceiverConfig(fs=FS, fc=FS / 4, max_fo=5000.0, fft_len=4096,
                         snr_threshold=20.0)
    short = iq[: int(6.0 * FS)]
    res = Receiver(cfg).process_iq(short)
    assert not res.solutions  # cold: no ephemeris, no anchors
    from tpu_gnss.io.stream import ArraySource
    warm_res = Receiver(cfg).process_source(ArraySource(short, FS),
                                            warm_ephemerides=warm)
    assert warm_res.solutions, \
        "warm start must fix from the HOW anchor before the subframe ends"
    sol = warm_res.solutions[-1]
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    assert err < 150.0, f"hot-start fix error {err:.1f} m"


@pytest.mark.slow
def test_almanac_directed_warm_search(scene):
    """Almanac-directed cold search (nav/almanac.py): a stored almanac +
    last fix restricts the sweep to the predicted-visible PRNs; the
    receiver still fixes, detects only within the subset, collects an
    almanac store of its own, and falls back to the full sweep when the
    directed set is junk (stale almanac)."""
    iq, ephs, rx = scene
    from tpu_gnss.io.stream import ArraySource

    # the scene synthesizes every SV regardless of horizon geometry
    # (no Earth-blockage model), so almanac->elevation prediction is
    # exercised in tests/test_almanac.py; here the directed set is a
    # 5-PRN proper subset of the 32-PRN sweep, as visible_prns would
    # produce, with PRN 7 deliberately excluded
    visible = [2, 3, 4, 5, 6]

    warm = {k + 2: e for k, e in enumerate(ephs)}
    cfg = ReceiverConfig(fs=FS, fc=FS / 4, max_fo=5000.0, fft_len=4096,
                         snr_threshold=20.0)
    short = iq[: int(8.0 * FS)]
    recv = Receiver(cfg)
    res = recv.process_source(ArraySource(short, FS),
                              warm_ephemerides=warm,
                              search_prns=visible)
    # a SUCCESSFUL directed cold start retires the subset searcher so
    # later re-acquisition sweeps the full constellation (rising SVs
    # beyond the almanac margin stay reachable); that it ran at all is
    # proven by the detections being confined to the subset
    assert recv._searcher_directed is None
    assert res.detections and all(d["prn"] in visible
                                  for d in res.detections)
    assert all(d["prn"] != 7 for d in res.detections)
    assert res.solutions, "directed warm start must fix within 8 s"
    sol = res.solutions[-1]
    err = np.linalg.norm(np.array([sol.x, sol.y, sol.z]) - np.array(rx))
    assert err < 150.0, f"directed warm-start error {err:.1f} m"
    # the receiver rebuilt its own store from the validated ephemerides
    assert set(recv.almanac) >= set(d["prn"] for d in res.detections)

    # stale/junk directed set: none of these PRNs exist in the scene ->
    # the receiver falls back to the full sweep and still detects
    recv2 = Receiver(cfg)
    res2 = recv2.process_source(ArraySource(short, FS),
                                warm_ephemerides=warm,
                                search_prns=[25, 26, 27, 28])
    assert recv2._searcher_directed is None, \
        "junk directed set must be dropped"
    assert len(res2.detections) >= 4, res2.detections
