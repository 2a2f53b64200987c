"""Vectorized tracking channel bank — DLL + Costas loops as a lax.scan.

The reference tracks 12 satellites in FPGA fabric: per-channel code/carrier
NCOs, early/prompt/late correlators with 1 ms integrate-and-dump, and PI
loop filters serviced at the epoch rate, supervised over SPI
(reference: c/channel.cpp; loop structure documented in
"Homemade GPS Receiver.html":287-352 — ~20 Hz Costas, ~1 Hz DLL).

Here the whole channel bank is one array program: state is a pytree batched
over channels, each 1 ms epoch processes a fixed ``P = fs/1000``-sample
block shared by all channels (they all see the same front-end stream, so
the correlators are one broadcasted multiply-reduce), and time is a
``lax.scan`` over epochs.  Fixed-size blocks keep shapes static for XLA;
code-phase drift relative to the block grid lives in the fractional
``code_phase`` state instead of variable block lengths.

Loop design: standard 2nd-order loops (Kaplan/Hegarty coefficients,
zeta = 0.707) with NCO frequency = seed + filter(e), where the seed comes
from acquisition and the filter is proportional + accumulated integral.
The reference's carrier pull-in trick — re-seeding the carrier NCO from
the locked code Doppler after a settling period
(reference: c/channel.cpp:190-207) — is :func:`carrier_pull_in`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CHIP_RATE_HZ, CODE_LEN_CHIPS, L1_HZ
from ..signal import cacode


def second_order_gains(bn_hz: float, zeta: float = 0.7071,
                       t_s: float = 1e-3) -> tuple[float, float]:
    """(k1, k2) for a 2nd-order loop updated every ``t_s`` seconds.

    wn = 8*zeta*Bn/(4*zeta^2+1); filter(e) = k1*e + acc, acc += k2*e.
    """
    wn = 8.0 * zeta * bn_hz / (4.0 * zeta * zeta + 1.0)
    return 2.0 * zeta * wn, wn * wn * t_s


class ChannelState(NamedTuple):
    """Batched tracking state, all arrays ``[n_chan]``."""
    active: jnp.ndarray         # bool: channel enabled
    carrier_phase: jnp.ndarray  # cycles, mod 1
    carrier_seed: jnp.ndarray   # Hz: acquisition / pull-in Doppler seed
    code_phase: jnp.ndarray     # chips, mod 1023
    pll_acc: jnp.ndarray        # PLL integrator (rad/s)
    dll_acc: jnp.ndarray        # DLL integrator (chips/s)
    carrier_freq: jnp.ndarray   # Hz: last effective carrier frequency
    code_freq: jnp.ndarray      # chips/s: last effective code rate
    pwr_avg: jnp.ndarray        # running prompt power average
    ip_prev: jnp.ndarray        # previous prompt I (FLL discriminator)
    qp_prev: jnp.ndarray        # previous prompt Q


class EpochOut(NamedTuple):
    """Per-epoch outputs, arrays ``[n_epochs, n_chan]``."""
    ip: jnp.ndarray
    qp: jnp.ndarray
    e_mag: jnp.ndarray
    l_mag: jnp.ndarray
    carrier_freq: jnp.ndarray
    code_freq: jnp.ndarray
    code_phase: jnp.ndarray     # chips at epoch START


def init_state(n_chan: int) -> ChannelState:
    z = jnp.zeros(n_chan, jnp.float32)
    return ChannelState(
        active=jnp.zeros(n_chan, bool),
        carrier_phase=z, carrier_seed=z, code_phase=z,
        pll_acc=z, dll_acc=z,
        carrier_freq=z,
        code_freq=jnp.full(n_chan, CHIP_RATE_HZ, jnp.float32),
        pwr_avg=z, ip_prev=z, qp_prev=z)


def start_channel(state: ChannelState, ch: int, doppler_hz: float,
                  code_phase_chips: float) -> ChannelState:
    """Seed one channel from an acquisition result.

    ``code_phase_chips``: code phase (advance) at the first sample the
    tracker will see — from acquisition, ``ca_shift * CHIP_RATE/fs`` plus
    whole-block drift.  Doppler-scaled code rate seeding mirrors the
    reference's channel start (reference: c/channel.cpp:144-149).
    """
    upd = lambda a, v: a.at[ch].set(jnp.float32(v))
    return state._replace(
        active=state.active.at[ch].set(True),
        carrier_phase=upd(state.carrier_phase, 0.0),
        carrier_seed=upd(state.carrier_seed, doppler_hz),
        code_phase=upd(state.code_phase, code_phase_chips % CODE_LEN_CHIPS),
        pll_acc=upd(state.pll_acc, 0.0),
        dll_acc=upd(state.dll_acc, 0.0),
        carrier_freq=upd(state.carrier_freq, doppler_hz),
        code_freq=upd(state.code_freq,
                      CHIP_RATE_HZ * (1.0 + doppler_hz / L1_HZ)),
        pwr_avg=upd(state.pwr_avg, 0.0),
        ip_prev=upd(state.ip_prev, 0.0),
        qp_prev=upd(state.qp_prev, 0.0))


@functools.partial(
    jax.jit,
    static_argnames=("fs", "pll_gains", "dll_gains", "fll_bn_hz",
                     "corr_spacing", "carrier_aiding"))
def track_epochs(samples: jnp.ndarray, state: ChannelState,
                 code_tables: jnp.ndarray, *, fs: float,
                 pll_gains: tuple[float, float],
                 dll_gains: tuple[float, float],
                 fll_bn_hz: float = 3.0,
                 corr_spacing: float = 0.5,
                 carrier_aiding: bool = True
                 ) -> tuple[ChannelState, EpochOut]:
    """Run the channel bank over a span of complex baseband samples.

    Args:
      samples: ``[n_epochs * P]`` complex64 baseband (front-end mixed);
        length is truncated to a whole number of epochs.
      state: batched ChannelState.
      code_tables: ``[n_chan, 1023]`` bipolar float32 chips per channel.
      fs: sample rate; P = round(fs/1000) samples per epoch.
      pll_gains / dll_gains: (k1, k2) from :func:`second_order_gains`.
      corr_spacing: early/late offset in chips.
      carrier_aiding: derive code-rate Doppler from the carrier loop
        (scaled by CHIP_RATE/L1), the standard aiding the reference
        approximates with its pull-in reseeding.

    Returns (final state, per-epoch outputs).
    """
    p = int(round(fs * 1e-3))
    n_epochs = samples.shape[0] // p
    blocks = samples[: n_epochs * p].reshape(n_epochs, p)
    pll_k1, pll_k2 = pll_gains
    dll_k1, dll_k2 = dll_gains
    n = jnp.arange(p, dtype=jnp.float32)
    two_pi = 2.0 * jnp.pi
    t_epoch = p / fs

    def epoch(st: ChannelState, blk: jnp.ndarray):
        # --- correlators -------------------------------------------------
        chips_t = st.code_phase[:, None] + (st.code_freq / fs)[:, None] * n
        def corr(offset):
            idx = jnp.floor(chips_t + offset).astype(jnp.int32) % CODE_LEN_CHIPS
            code = jnp.take_along_axis(code_tables, idx, axis=1)
            return (wiped * code).sum(axis=1)

        ph = st.carrier_phase[:, None] + (st.carrier_freq / fs)[:, None] * n
        ang = (-two_pi) * ph
        wiped = blk[None, :] * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))

        cp = corr(0.0)
        ce = corr(corr_spacing)
        cl = corr(-corr_spacing)
        ip, qp = cp.real, cp.imag
        e_mag = jnp.abs(ce)
        l_mag = jnp.abs(cl)

        # --- discriminators ---------------------------------------------
        # Costas: atan(Q/I), data-bit insensitive (rad)
        pll_err = jnp.arctan(qp / jnp.where(jnp.abs(ip) < 1e-9, 1e-9, ip))
        # FLL: data-insensitive cross/dot over consecutive prompts (Hz)
        cross = st.ip_prev * qp - st.qp_prev * ip
        dot = st.ip_prev * ip + st.qp_prev * qp
        fll_err = jnp.arctan(cross / jnp.where(jnp.abs(dot) < 1e-9, 1e-9,
                                               dot)) / (two_pi * t_epoch)
        # no previous prompt on the very first active epoch of a channel:
        # prev power 0 -> discriminator forced to 0
        prev_pwr = st.ip_prev * st.ip_prev + st.qp_prev * st.qp_prev
        fll_err = jnp.where(prev_pwr > 0, fll_err, 0.0)
        # DLL: normalized noncoherent early-minus-late (chips)
        denom = jnp.maximum(e_mag + l_mag, 1e-9)
        dll_err = corr_spacing * (e_mag - l_mag) / denom

        # --- loop filters: freq = seed + k1*e + acc ----------------------
        # FLL assist folds straight into the PLL integrator (rad/s)
        fll_k = 4.0 * fll_bn_hz * t_epoch
        pll_acc = st.pll_acc + jnp.where(
            st.active, pll_k2 * pll_err + fll_k * two_pi * fll_err, 0.0)
        carrier_freq = jnp.where(
            st.active,
            st.carrier_seed + (pll_k1 * pll_err + pll_acc) / two_pi,
            st.carrier_freq)

        dll_acc = st.dll_acc + jnp.where(st.active, dll_k2 * dll_err, 0.0)
        aid = jnp.where(jnp.bool_(carrier_aiding),
                        carrier_freq / L1_HZ * CHIP_RATE_HZ, 0.0)
        code_freq = jnp.where(
            st.active,
            CHIP_RATE_HZ + aid + dll_k1 * dll_err + dll_acc,
            st.code_freq)

        # --- NCO phase advance -------------------------------------------
        carrier_phase = jnp.where(
            st.active, (st.carrier_phase + carrier_freq / fs * p) % 1.0,
            st.carrier_phase)
        code_phase = jnp.where(
            st.active, (st.code_phase + code_freq / fs * p) % CODE_LEN_CHIPS,
            st.code_phase)

        pwr = ip * ip + qp * qp
        pwr_avg = jnp.where(st.active,
                            0.875 * st.pwr_avg + 0.125 * pwr, st.pwr_avg)

        out = EpochOut(ip=ip, qp=qp, e_mag=e_mag, l_mag=l_mag,
                       carrier_freq=carrier_freq, code_freq=code_freq,
                       code_phase=st.code_phase)
        new = ChannelState(active=st.active, carrier_phase=carrier_phase,
                           carrier_seed=st.carrier_seed,
                           code_phase=code_phase, pll_acc=pll_acc,
                           dll_acc=dll_acc, carrier_freq=carrier_freq,
                           code_freq=code_freq, pwr_avg=pwr_avg,
                           ip_prev=jnp.where(st.active, ip, st.ip_prev),
                           qp_prev=jnp.where(st.active, qp, st.qp_prev))
        return new, out

    return jax.lax.scan(epoch, state, blocks)


def channel_code_tables(prns, n_chan: int) -> np.ndarray:
    """``[n_chan, 1023]`` bipolar chips; unused channels get PRN 1."""
    tbl = 1.0 - 2.0 * cacode.code_table().astype(np.float32)
    out = np.tile(tbl[0], (n_chan, 1)).astype(np.float32)
    for ch, prn in enumerate(prns):
        out[ch] = tbl[prn - 1]
    return out


def carrier_pull_in(state: ChannelState, if_offset_hz: float = 0.0
                    ) -> ChannelState:
    """Re-seed the carrier loop from the locked code rate.

    The reference's acquisition-phase trick: the code loop always locks,
    so after a settling period the code Doppler gives a carrier Doppler
    estimate well inside the Costas capture range
    (reference: c/channel.cpp:190-207).  Resets the PLL integrator so the
    filter restarts around the new seed.
    """
    ca_dop = state.code_freq - CHIP_RATE_HZ
    lo_dop = ca_dop * (L1_HZ / CHIP_RATE_HZ) + if_offset_hz
    return state._replace(
        carrier_seed=jnp.where(state.active, lo_dop, state.carrier_seed),
        pll_acc=jnp.where(state.active, 0.0, state.pll_acc))
