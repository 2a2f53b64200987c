"""Full offline receiver pipeline: capture in, position fixes out.

The runtime layer replacing the reference's cooperative-coroutine
scheduler + task zoo (reference: c/coroutines.cpp, c/main.cpp:66-68 — one
search task, 12 channel tasks, one solve task round-robining on a Pi).
Here the "tasks" are pipeline stages over arrays:

  acquisition (device, batched)  ->  channel allocation (host)
  tracking scan (device, chunked) -> NAV bit/frame decode (host)
  ephemeris ingest               ->  PVT solve every 4 s (host)

Channel-management semantics follow the reference: strongest detections
fill the channel bank, a power watchdog frees dead channels and re-queues
their PRN for search (reference: c/channel.cpp:211-254 SignalLost), and
probation — a channel must decode parity-clean subframes before the
solver trusts it (reference: c/channel.cpp:39,343,363) — maps to
requiring a validated subframe + valid ephemeris per channel.

Transmit-time reconstruction is code-locked: an unwrapped chip counter
per channel (integrated from the tracked code rate) counts transmit time
from the last decoded subframe boundary, the software analog of the
reference's ms/bit counters + G1 snapshot arithmetic
(reference: c/solve.cpp:118-133).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .constants import CHIP_RATE_HZ, CODES_PER_BIT, CODE_LEN_CHIPS
from .config import ReceiverConfig
from .acquire.folded import FoldedSearcher
from .nav import bits as nav_bits
from .nav.ephemeris import Ephemeris
from .pvt import solve as pvt
from .track import channel as tc


@dataclasses.dataclass
class ChannelRecord:
    """Host-side per-channel bookkeeping (the CHANNEL struct analog)."""
    ch: int
    prn: int
    start_epoch: int
    ip_hist: list = dataclasses.field(default_factory=list)
    qp_hist: list = dataclasses.field(default_factory=list)
    code_freq_hist: list = dataclasses.field(default_factory=list)
    carrier_freq_hist: list = dataclasses.field(default_factory=list)
    code_phase0: float = 0.0      # chips at start_epoch
    bit_offset: Optional[int] = None
    bits: Optional[np.ndarray] = None
    eph: Ephemeris = dataclasses.field(default_factory=Ephemeris)
    subframes: list = dataclasses.field(default_factory=list)
    last_subframe_bit: Optional[int] = None   # bit index of last subframe
    last_tow: Optional[int] = None
    cn0_dbhz: Optional[float] = None
    lost: bool = False

    def unwrapped_chips(self, fs: float) -> np.ndarray:
        """Absolute chip count at each epoch start since start_epoch."""
        cf = np.asarray(self.code_freq_hist, dtype=np.float64)
        t_epoch = round(fs * 1e-3) / fs
        return self.code_phase0 + np.concatenate(
            [[0.0], np.cumsum(cf[:-1]) * t_epoch])


@dataclasses.dataclass
class ReceiverResult:
    detections: list
    channels: List[ChannelRecord]
    solutions: List[pvt.Solution]


class Receiver:
    """Offline full-chain receiver for complex-baseband or 1-bit captures."""

    def __init__(self, cfg: ReceiverConfig, pll_bn_hz: float = 18.0,
                 dll_bn_hz: float = 2.0, n_coherent: int = 4,
                 solve_interval_s: float = 4.0,
                 los_power_ratio: float = 0.05,
                 los_timeout_s: float = 2.0,
                 epochs_per_step: int = 10,
                 reacq_interval_s: float = 5.0,
                 fft_correlator: bool = True,
                 agc_thresholds: Optional[tuple] = None,
                 acq_engine: str = "auto"):
        self.cfg = cfg
        self.searcher = FoldedSearcher(cfg, n_coherent=n_coherent)
        t_s = epochs_per_step * 1e-3
        self.pll_gains = tc.second_order_gains(pll_bn_hz, t_s=t_s)
        self.dll_gains = tc.second_order_gains(dll_bn_hz, t_s=t_s)
        self.epochs_per_step = epochs_per_step
        self.solve_interval_s = solve_interval_s
        self.los_power_ratio = los_power_ratio
        self.los_timeout_s = los_timeout_s
        self.reacq_interval_s = reacq_interval_s
        self.fft_correlator = fft_correlator
        # strong-signal Costas gain reduction (reference:
        # c/channel.cpp:265-288); (lo, hi) on the running prompt power.
        # tuple() because it becomes a hashable jit-static argument.
        self.agc_thresholds = (tuple(agc_thresholds)
                               if agc_thresholds is not None else None)
        # cold-start acquisition engine: "mxu" = fused kernel detection
        # + narrow-window refinement (no full power grid); "xla" = grid
        # + refine; "auto" picks mxu on TPU when the transform factors
        self.acq_engine = acq_engine

    def _cold_detections(self, head, bits: bool = False) -> list:
        """Refined detections for channel seeding, engine-dispatched.

        ``head`` is a complex-baseband block, or raw {0,1} samples when
        ``bits`` (mixed on device).
        """
        engine = self.acq_engine
        if engine == "auto":
            import jax
            engine = ("mxu" if jax.devices()[0].platform in ("tpu", "axon")
                      and self.searcher.mxu_supported() else "xla")
        kw = dict(bits=head) if bits else dict(iq=head)
        if engine == "mxu":
            return self.searcher.detections_refined_fast(**kw)
        pwr = self.searcher.power_grid(**kw)
        return self.searcher.detections_refined(pwr)

    # ------------------------------------------------------------------
    def process_iq(self, iq: np.ndarray, max_channels: Optional[int] = None,
                   chunk_s: float = 2.0) -> ReceiverResult:
        """Run the full chain over a host complex-baseband capture."""
        import jax.numpy as jnp
        from .utils.xfer import to_device_complex
        from .utils.metrics import METRICS

        cfg = self.cfg
        p = round(cfg.fs * 1e-3)
        n_epochs_total = len(iq) // p
        max_channels = max_channels or cfg.num_chans
        assert int(chunk_s * 1000) % self.epochs_per_step == 0, \
            "chunk_s must cover whole tracking steps"

        # --- 1. acquisition on the first coherent block ----------------
        with METRICS.stage("receiver.acquire"):
            dets = sorted(
                self._cold_detections(
                    np.asarray(iq[: self.searcher.block_len])),
                key=lambda d: -d["snr"])[:max_channels]

        # --- 2. channel bank allocation --------------------------------
        n_chan = max(len(dets), 1)
        state = tc.init_state(n_chan)
        recs = []
        for ch, d in enumerate(dets):
            code_phase = d["ca_shift"] * CHIP_RATE_HZ / cfg.fs
            state = tc.start_channel(state, ch, d["doppler_hz"], code_phase)
            recs.append(ChannelRecord(ch=ch, prn=d["prn"], start_epoch=0,
                                      code_phase0=code_phase))
        tables = jnp.asarray(
            tc.channel_code_tables([r.prn for r in recs], n_chan))
        code_ffts = self._spectra([r.prn for r in recs], n_chan)

        # --- 3. tracking scan over the capture, chunked ----------------
        # chunks are sliced host-side and transferred per chunk: eager
        # device slicing is not portable (see utils.xfer notes)
        chunk_ep = max(1, int(chunk_s * 1000))
        iq_host = np.asarray(iq[: n_epochs_total * p])
        e0 = 0
        n_tracked = 0   # epochs actually produced (track_epochs drops a
        #                 trailing partial step of the final chunk)
        while e0 < n_epochs_total:
            e1 = min(e0 + chunk_ep, n_epochs_total)
            with METRICS.stage("receiver.transfer"):
                seg = to_device_complex(iq_host[e0 * p: e1 * p])
            with METRICS.stage("receiver.track"):
                state, out = tc.track_epochs(
                    seg, state, tables, fs=cfg.fs,
                    pll_gains=self.pll_gains, dll_gains=self.dll_gains,
                    epochs_per_step=self.epochs_per_step,
                    code_ffts=code_ffts,
                    agc_thresholds=self.agc_thresholds)
                ip = np.asarray(out.ip)
                qp = np.asarray(out.qp)
                cf = np.asarray(out.code_freq)
                caf = np.asarray(out.carrier_freq)
            for r in recs:
                if not r.lost:
                    r.ip_hist.extend(ip[:, r.ch].tolist())
                    r.qp_hist.extend(qp[:, r.ch].tolist())
                    r.code_freq_hist.extend(cf[:, r.ch].tolist())
                    r.carrier_freq_hist.extend(caf[:, r.ch].tolist())
            n_tracked += ip.shape[0]
            e0 = e1
            self._watchdog(recs, p)

        # --- 4. NAV decode per channel ---------------------------------
        for r in recs:
            self._decode_nav(r)

        # --- 5. PVT solves (over epochs that really reached tracking) ---
        solutions = []
        step = int(self.solve_interval_s * 1000)
        snap_epochs = list(range(step, n_tracked, step))
        if n_tracked - 2 not in snap_epochs and n_tracked > 2:
            snap_epochs.append(n_tracked - 2)
        for e_snap in snap_epochs:
            sol = self._solve_at(recs, e_snap)
            if sol is not None:
                solutions.append(sol)

        return ReceiverResult(detections=dets, channels=recs,
                              solutions=solutions)

    # ------------------------------------------------------------------
    def process_source(self, source, max_duration_s: Optional[float] = None,
                       max_channels: Optional[int] = None,
                       chunk_s: float = 1.0,
                       warm_ephemerides: Optional[dict] = None
                       ) -> ReceiverResult:
        """Streaming full chain over a :class:`tpu_gnss.io.stream` source.

        Bounded memory: raw samples are consumed chunk-by-chunk; only the
        per-epoch correlator outputs are retained (50 bytes/s/channel
        scale — the same reduction the reference's FPGA integrate-and-dump
        achieves before the Pi ever sees data).

        ``warm_ephemerides``: {prn: Ephemeris} from a previous run's
        checkpoint.  A warm channel only needs ONE subframe (any id) for
        its TOW anchor instead of decoding all of 1-3 — first fix in ~7 s
        of capture instead of ~20 s.
        """
        import jax.numpy as jnp
        from .io.stream import Prefetcher
        from .utils.xfer import to_device_complex
        from .utils.metrics import METRICS

        cfg = self.cfg
        p = round(cfg.fs * 1e-3)
        assert int(chunk_s * 1000) % self.epochs_per_step == 0, \
            "chunk_s must cover whole tracking steps"
        chunk_len = max(1, int(chunk_s * 1000)) * p
        # fast path for 1-bit sources: transfer raw {0,1} samples (8x
        # smaller than complex64) and run the quadrature mix on device
        # with a running sample offset — host stays at file-I/O speed.
        # Sources configured for the reference's per-block LO phase
        # restart must keep their own (host) mixing.
        use_bits = (hasattr(source, "bit_blocks")
                    and not getattr(source, "per_block_phase", False))
        blocks = iter(Prefetcher(source, chunk_len, bits=use_bits))

        with METRICS.stage("receiver.read"):
            first = next(blocks, None)
        if first is None:
            return ReceiverResult(detections=[], channels=[], solutions=[])
        assert len(first) >= self.searcher.block_len, \
            "chunk_s too small for the acquisition block"

        n_chan = max_channels or cfg.num_chans
        state = tc.init_state(n_chan)
        tables_np = tc.channel_code_tables([], n_chan)
        live: dict = {}      # channel slot -> active ChannelRecord
        recs: list = []      # every record ever started (incl. lost)
        first_dets: list = []

        def try_acquire(blk_head, epoch_now):
            """Search for SVs not currently tracked; fill free slots.

            The SearchEnable/SearchTask loop analog
            (reference: c/search.cpp:214-238, c/channel.cpp:246-254).
            """
            nonlocal state
            free = [ch for ch in range(n_chan) if ch not in live]
            if not free:
                return []
            dets = sorted(self._cold_detections(blk_head, bits=use_bits),
                          key=lambda d: -d["snr"])
            tracked = {r.prn for r in live.values()}
            started = []
            for d in dets:
                if d["prn"] in tracked or not free:
                    continue
                ch = free.pop(0)
                code_phase = d["ca_shift"] * CHIP_RATE_HZ / cfg.fs
                state = tc.start_channel(state, ch, d["doppler_hz"],
                                         code_phase)
                tables_np[ch] = tc.channel_code_tables([d["prn"]], 1)[0]
                rec = ChannelRecord(ch=ch, prn=d["prn"],
                                    start_epoch=epoch_now,
                                    code_phase0=code_phase)
                if warm_ephemerides and d["prn"] in warm_ephemerides:
                    rec.eph = warm_ephemerides[d["prn"]]
                live[ch] = rec
                recs.append(rec)
                tracked.add(d["prn"])
                started.append(d)
            return started

        with METRICS.stage("receiver.acquire"):
            first_dets = try_acquire(first[: self.searcher.block_len], 0)
        reacq_cooldown = int(self.reacq_interval_s * 1000)
        next_reacq = reacq_cooldown

        n_epochs_total = 0
        blk = first
        while blk is not None:
            n_ep = len(blk) // p
            if n_ep == 0:
                break
            if (n_epochs_total >= next_reacq and len(live) < n_chan
                    and len(blk) >= self.searcher.block_len):
                with METRICS.stage("receiver.acquire"):
                    try_acquire(blk[: self.searcher.block_len],
                                n_epochs_total)
                next_reacq = n_epochs_total + reacq_cooldown
            tables = jnp.asarray(tables_np)
            code_ffts = self._spectra(
                [live[ch].prn if ch in live else 1 for ch in range(n_chan)],
                n_chan)
            with METRICS.stage("receiver.transfer"):
                if use_bits:
                    seg = self._mix_chunk(
                        jnp.asarray(np.ascontiguousarray(blk[: n_ep * p])),
                        n_epochs_total * p)
                else:
                    seg = to_device_complex(
                        np.ascontiguousarray(blk[: n_ep * p]))
            with METRICS.stage("receiver.track"):
                state, out = tc.track_epochs(
                    seg, state, tables, fs=cfg.fs,
                    pll_gains=self.pll_gains, dll_gains=self.dll_gains,
                    epochs_per_step=self.epochs_per_step,
                    code_ffts=code_ffts,
                    agc_thresholds=self.agc_thresholds)
                ip = np.asarray(out.ip)
                qp = np.asarray(out.qp)
                cf = np.asarray(out.code_freq)
                caf = np.asarray(out.carrier_freq)
            for r in live.values():
                r.ip_hist.extend(ip[:, r.ch].tolist())
                r.qp_hist.extend(qp[:, r.ch].tolist())
                r.code_freq_hist.extend(cf[:, r.ch].tolist())
                r.carrier_freq_hist.extend(caf[:, r.ch].tolist())
            n_epochs_total += ip.shape[0]
            # watchdog: free dead channels and their slots (SignalLost)
            self._watchdog(list(live.values()), p)
            for ch in [c for c, r in live.items() if r.lost]:
                state = tc.stop_channel(state, ch)
                del live[ch]
            if (max_duration_s is not None
                    and n_epochs_total * 1e-3 >= max_duration_s):
                break
            with METRICS.stage("receiver.read"):
                blk = next(blocks, None)

        with METRICS.stage("receiver.nav"):
            for r in recs:
                self._decode_nav(r)
        dets = first_dets
        solutions = []
        step = int(self.solve_interval_s * 1000)
        snap_epochs = list(range(step, n_epochs_total, step))
        if n_epochs_total - 2 not in snap_epochs and n_epochs_total > 2:
            snap_epochs.append(n_epochs_total - 2)
        for e_snap in snap_epochs:
            sol = self._solve_at(recs, e_snap)
            if sol is not None:
                solutions.append(sol)
        return ReceiverResult(detections=dets, channels=recs,
                              solutions=solutions)

    # ------------------------------------------------------------------
    def _mix_chunk(self, bits_dev, sample0: int):
        """Device-side quadrature mix of a {0,1} chunk (jitted, cached).

        The LO phase offset for the chunk is reduced on the host in
        float64 (exact for any capture length; an int32 sample counter
        on device would overflow past 2^31 samples).
        """
        if not hasattr(self, "_mix_fn"):
            import jax
            from .acquire.search import mix_baseband
            lo_rate = self.cfg.lo_rate
            self._mix_fn = jax.jit(
                lambda b, p0: mix_baseband(b, lo_rate,
                                           phase0_quarters=p0))
        import jax.numpy as jnp
        p0 = float((sample0 * float(self.cfg.lo_rate)) % 4.0)
        return self._mix_fn(bits_dev, jnp.float32(p0))

    # ------------------------------------------------------------------
    def _spectra(self, prns, n_chan):
        """Device correlator spectra for the channel set (FFT mode)."""
        if not self.fft_correlator:
            return None
        key = tuple(prns)
        cached = getattr(self, "_spectra_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        from .utils.xfer import to_device_complex
        spec = tc.code_spectra_np(list(prns), n_chan, self.cfg.fs)
        dev = to_device_complex(spec)
        self._spectra_cache = (key, dev)
        return dev

    # ------------------------------------------------------------------
    def _watchdog(self, recs, p) -> None:
        """Free channels whose prompt power collapsed (SignalLost analog)."""
        win = int(self.los_timeout_s * 1000)
        for r in recs:
            if r.lost or len(r.ip_hist) < 2 * win:
                continue
            # slice the python lists BEFORE converting: converting the
            # whole history every chunk is quadratic over a long stream
            ref = np.asarray(r.ip_hist[win // 2: win])
            cur = np.asarray(r.ip_hist[-win:])
            ref_pwr = float(np.mean(np.square(ref)))
            cur_pwr = float(np.mean(np.square(cur)))
            if ref_pwr > 0 and cur_pwr < self.los_power_ratio * ref_pwr:
                r.lost = True

    def _decode_nav(self, r: ChannelRecord) -> None:
        from .track.quality import cn0_nwpr
        ip = np.asarray(r.ip_hist)
        if len(ip) < 40 * CODES_PER_BIT:
            return
        qp = np.asarray(r.qp_hist)
        r.cn0_dbhz = cn0_nwpr(ip[-2000:], qp[-2000:])
        # bit sync on the post-pull-in stream, but bit indices must stay
        # aligned to epoch 0 for transmit-time bookkeeping
        skip = 600
        skip -= skip % CODES_PER_BIT
        off = nav_bits.bit_sync(ip[skip:])
        r.bit_offset = off
        bits = nav_bits.bits_from_prompt(ip[skip:], off)
        r.bits = bits
        frames = nav_bits.frame_sync(bits)
        for f in frames:
            sid = r.eph.ingest(f["data"])
            # absolute epoch at which this subframe's first bit begins
            bit_epoch = skip + off + f["start"] * CODES_PER_BIT
            r.subframes.append(dict(sid=sid, tow=r.eph.tow,
                                    bit_epoch=bit_epoch))
            r.last_subframe_bit = bit_epoch
            r.last_tow = r.eph.tow

    def _solve_at(self, recs, e_snap: int) -> Optional[pvt.Solution]:
        """Assemble a consistent snapshot at epoch ``e_snap`` and solve.

        All channels are sampled at the same receiver epoch — the trivial
        array analog of the reference's spi_hog atomic multi-channel clock
        capture (reference: c/solve.cpp:62-85).
        """
        t_tx, ephs, weights, dops, used = [], [], [], [], []
        for r in recs:
            e_local = e_snap - r.start_epoch  # records may start mid-run
            if (not r.eph.valid()
                    or e_local >= len(r.ip_hist) or e_local <= 0):
                continue
            # anchor on the LATEST decoded subframe preceding this
            # snapshot (subframes arrive every 6 s; anchoring on the
            # capture's final subframe would skip every earlier snapshot)
            anchors = [s for s in r.subframes
                       if s["tow"] is not None and s["bit_epoch"] < e_local]
            if not anchors:
                continue
            sub = max(anchors, key=lambda s: s["bit_epoch"])
            chips = r.unwrapped_chips(self.cfg.fs)
            a_snap = chips[e_local]
            # chip count at the subframe-start bit edge: nearest code-period
            # boundary on the 20-period bit grid
            a_bit = chips[sub["bit_epoch"]]
            n_per = round(a_bit / CODE_LEN_CHIPS)
            # TOW names the start of the NEXT subframe -> this one is tow-1
            t0 = (sub["tow"] - 1) * 6.0
            t = t0 + (a_snap - n_per * CODE_LEN_CHIPS) / CHIP_RATE_HZ
            t_tx.append(t)
            ephs.append(r.eph)
            ip = np.asarray(r.ip_hist[max(0, e_local - 8): e_local])
            weights.append(float(np.mean(np.square(ip))))
            # carrier Doppler at the snapshot, smoothed over the last
            # 100 ms to average PLL jitter (the loop BW is ~18 Hz)
            cfh = r.carrier_freq_hist[max(0, e_local - 100): e_local]
            dops.append(float(np.mean(cfh)) if cfh else np.nan)
            used.append(r)
        if len(t_tx) < 4:
            return None
        sol = pvt.solve_position(np.asarray(t_tx), ephs,
                                 np.asarray(weights), apply_iono=True)
        if sol is None or not sol.converged:
            return None
        # satellite view + DOPs for NMEA emission (cli.nmea_out)
        from .cli.nmea_out import sat_geometry
        sv = np.array([e.get_xyz(t) for e, t in zip(ephs, t_tx)])
        elev, az, dop_d = sat_geometry(np.array([sol.x, sol.y, sol.z]), sv)
        sol.dops = dop_d
        sol.sats = [dict(prn=r.prn, elev_deg=float(el), az_deg=float(a),
                         cn0_dbhz=r.cn0_dbhz, used=True)
                    for r, el, a in zip(used, elev, az)]
        # Doppler velocity solve at the converged position (VTG analog;
        # beyond the reference, which never computes velocity)
        dops = np.asarray(dops)
        if np.all(np.isfinite(dops)):
            try:
                sol.vel = pvt.solve_velocity(
                    np.array([sol.x, sol.y, sol.z]), sol.t_rx,
                    np.asarray(t_tx), ephs, dops, np.asarray(weights))
            except np.linalg.LinAlgError:
                pass
        return sol
