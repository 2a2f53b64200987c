"""Subframe 4/5 almanac: codec, reduced orbit, visibility, checkpoint.

The reference discards almanac pages (c/ephemeris.cpp:183-207 handles
only subframe ids 1-3 plus the page-18 ionosphere); tpu_gnss decodes
them and uses the store to direct warm-start cold searches
(nav/almanac.py, receiver.py search_prns).
"""

import dataclasses

import numpy as np
import pytest

from tpu_gnss.nav import almanac as alm
from tpu_gnss.nav import bits as nb
from tpu_gnss.pvt import solve as ps

from .test_pvt import make_constellation

T_OE = 302400.0
TRUTH_LLA = (52.45, -1.9, 120.0)


def _almanacs(n=6):
    return {k + 2: alm.Almanac.from_ephemeris(k + 2, e)
            for k, e in enumerate(make_constellation(n, t_oe=T_OE))}


def test_page_codec_roundtrip():
    """encode_pages emits parity-valid subframes that frame_sync accepts
    and ingest_page decodes back to the quantized fields, with the ICD
    page allocation (PRN<=24 on subframe 5, 25-32 on subframe 4)."""
    alms = _almanacs(4)
    alms[27] = dataclasses.replace(alms[2], prn=27)
    frames = alm.encode_pages(alms, tow_start=50400 // 6)
    stream = np.concatenate(frames)
    found = nb.frame_sync(stream)
    assert len(found) == len(alms)
    for f in found:
        from tpu_gnss.nav.ephemeris import subframe_id
        page = alm.ingest_page(f["data"])
        assert page is not None
        src = alms[page.prn]
        assert subframe_id(f["data"]) == (5 if page.prn <= 24 else 4)
        for fld in dataclasses.fields(alm.Almanac):
            assert getattr(page, fld.name) == pytest.approx(
                getattr(src, fld.name), abs=1e-12), fld.name


def test_ingest_page_rejects_non_sv_pages():
    """The iono page (sv-id 56) and wrong data IDs must not become
    almanac entries."""
    from tpu_gnss.nav.ephemeris import Ephemeris, encode_subframes
    eph = Ephemeris(alpha=(1e-8, 0, 0, 0), beta=(90112, 0, 0, 0))
    (page18,) = encode_subframes(eph, tow_start=100, sids=(4,))
    found = nb.frame_sync(page18)
    assert len(found) == 1
    assert alm.ingest_page(found[0]["data"]) is None


def test_reduced_orbit_tracks_ephemeris():
    """The almanac orbit (no harmonics, quantized elements) stays within
    a few km of the full ephemeris over +-6 h around the epoch — far
    inside what elevation prediction needs (26000 km orbit radius)."""
    ephs = make_constellation(6, t_oe=T_OE)
    for k, eph in enumerate(ephs):
        a = alm.Almanac.from_ephemeris(k + 2, eph)
        for dt in (-21600.0, -3600.0, 0.0, 3600.0, 21600.0):
            t = T_OE + dt
            pa = np.array(a.get_xyz(t))
            pe = np.array(eph.get_xyz(t))
            assert np.linalg.norm(pa) > 2e7
            err = np.linalg.norm(pa - pe)
            assert err < 10e3, f"sv{k} dt={dt}: {err/1e3:.1f} km"


def test_visible_prns_matches_ephemeris_elevations():
    """Almanac-predicted visibility agrees with the true (ephemeris)
    elevations away from the mask boundary."""
    ephs = make_constellation(8, t_oe=T_OE)
    rx = ps.geodetic_to_ecef(*TRUTH_LLA)
    alms = {k + 2: alm.Almanac.from_ephemeris(k + 2, e)
            for k, e in enumerate(ephs)}
    t = T_OE + 90.0
    vis = alm.visible_prns(alms, rx, t, mask_deg=5.0)
    for k, eph in enumerate(ephs):
        el = alm.elevation_deg(eph.get_xyz(t), rx)
        if el > 7.0:
            assert k + 2 in vis, f"sv{k} el={el:.1f} missing"
        elif el < 3.0:
            assert k + 2 not in vis, f"sv{k} el={el:.1f} included"
    # an unhealthy SV is never proposed
    alms[2] = dataclasses.replace(alms[2], health=63.0)
    assert 2 not in alm.visible_prns(alms, rx, t, mask_deg=5.0)


def test_visibility_margin_catches_rising_sv():
    """margin_s widens the window: an SV below the mask now but above it
    within the margin is kept (rising satellite / stale clock)."""
    ephs = make_constellation(12, t_oe=T_OE)
    rx = ps.geodetic_to_ecef(*TRUTH_LLA)
    alms = {k + 2: alm.Almanac.from_ephemeris(k + 2, e)
            for k, e in enumerate(ephs)}
    t = T_OE + 90.0
    now = set(alm.visible_prns(alms, rx, t, mask_deg=5.0))
    margin = set(alm.visible_prns(alms, rx, t, mask_deg=5.0,
                                  margin_s=6 * 3600.0))
    assert now <= margin
    assert margin - now, "half an orbit later some SV must have risen"


def test_checkpoint_roundtrip(tmp_path):
    """save_state/load_state carry the almanac store loss-free."""
    from tpu_gnss.utils.checkpoint import load_state, save_state
    alms = _almanacs(5)
    path = str(tmp_path / "state.npz")
    save_state(path, almanac=alms,
               meta=dict(last_fix=dict(ecef=[1.0, 2.0, 3.0], tow=4.5)))
    back = load_state(path)
    assert sorted(back["almanac"]) == sorted(alms)
    for prn, a in alms.items():
        b = back["almanac"][prn]
        for fld in dataclasses.fields(alm.Almanac):
            assert getattr(b, fld.name) == pytest.approx(
                getattr(a, fld.name), abs=0.0), fld.name
    assert back["meta"]["last_fix"]["tow"] == 4.5
