"""Multi-device sharded acquisition.

The reference's only inter-processor transport is a 16-opcode SPI
command/response link between the Pi and the FPGA (reference: c/spi.cpp,
c/spi.h); its acquisition grid is a serial double loop on one core.  Here
the (PRN x Doppler x block) grid is sharded over a `jax.sharding.Mesh` and
the peak search is combined with XLA collectives over ICI/DCN:

* **Doppler sharding** (latency): each device searches a contiguous slice
  of the Doppler grid for all SVs; per-device bests are all-gathered and
  reduced in device order so tie-breaking matches the serial scan.
* **Block sharding** (throughput): different capture blocks to different
  devices — embarrassingly parallel, used for long captures.

Both compose: mesh ('blk', 'dop').
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..acquire.search import AcqResult, acquire_from_fft, mix_baseband


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("dop",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    if shape is None:
        shape = (len(devs),) if len(axes) == 1 else None
    assert shape is not None and int(np.prod(shape)) == len(devs)
    return Mesh(np.asarray(devs).reshape(shape), axes)


def pad_dops(dops: np.ndarray, n_shards: int, dop_chunk: int) -> np.ndarray:
    """Pad the Doppler grid so each shard gets equal whole chunks.

    Padding replays the final bin; duplicates can never win the
    first-max-wins reduction over an ascending grid, so results are
    unchanged.
    """
    per = -(-len(dops) // (n_shards * dop_chunk)) * dop_chunk
    pad = per * n_shards - len(dops)
    return np.concatenate([dops, np.full(pad, dops[-1], dops.dtype)])


@functools.partial(jax.jit, static_argnames=("mesh", "lags", "dop_chunk"))
def acquire_from_fft_sharded(data_fft: jnp.ndarray, code_ffts: jnp.ndarray,
                             dops: jnp.ndarray, *, mesh: Mesh, lags: int,
                             dop_chunk: int = 16) -> AcqResult:
    """Doppler-sharded grid search for one block.

    ``dops`` length must divide evenly by mesh['dop'] (use :func:`pad_dops`).
    data/code spectra are replicated (they are small: ~10 MB for 32 SVs);
    only the Doppler axis is split.  The cross-device reduction all-gathers
    the tiny per-device best triples and reduces them in device order, the
    collective analog of the solver's snapshot assembly over SPI
    (reference: c/solve.cpp:62-85).
    """
    ndop_axis = mesh.shape["dop"]
    assert dops.shape[0] % ndop_axis == 0

    def body(data_fft, code_ffts, dops_local):
        res = acquire_from_fft(data_fft, code_ffts, dops_local,
                               lags=lags, dop_chunk=dop_chunk)
        snr_g = jax.lax.all_gather(res.snr, "dop")       # [ndev, n_sv]
        dop_g = jax.lax.all_gather(res.lo_shift, "dop")
        lag_g = jax.lax.all_gather(res.ca_shift, "dop")
        # first-max-wins across devices == serial ascending-Doppler scan
        idx = jnp.argmax(snr_g, axis=0)
        take = lambda a: jnp.take_along_axis(a, idx[None, :], 0)[0]
        return AcqResult(take(snr_g), take(dop_g), take(lag_g))

    spec_rep = P()
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_rep, spec_rep, P("dop")),
        out_specs=AcqResult(spec_rep, spec_rep, spec_rep),
        check_vma=False)
    return fn(data_fft, code_ffts, dops)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "fs", "lo_rate", "n_coherent",
                                    "dop_chunk", "period", "nf",
                                    "from_bits", "interpret"))
def acquire_folded_sharded(blocks: jnp.ndarray, cw_r: jnp.ndarray,
                           cw_i: jnp.ndarray, dops_hz: jnp.ndarray, *,
                           mesh: Mesh, fs: float, lo_rate: float,
                           n_coherent: int, dop_chunk: int = 16,
                           period: int = 0, nf: int = 0,
                           from_bits: bool = True,
                           interpret: bool = False):
    """Block+Doppler sharded folded acquisition through the MXU kernel.

    The fast single-chip engine (tpu_gnss.ops.mxu_corr) is also the
    scale-out engine: each (blk, dop) device wipes/folds/correlates its
    capture blocks over its contiguous Doppler slice, then per-device
    bests are all-gathered and reduced in device order (ascending
    Doppler, so tie-breaks match the serial scan).  ``dops_hz`` must
    divide by mesh['dop'] (:func:`pad_dops`), ``blocks`` by mesh['blk'].
    """
    from ..acquire.folded import FoldedResult, acquire_folded_batch_mxu
    assert blocks.shape[0] % mesh.shape["blk"] == 0
    assert dops_hz.shape[0] % mesh.shape["dop"] == 0

    def body(blocks_local, cw_r, cw_i, dops_local):
        res = acquire_folded_batch_mxu(
            blocks_local, cw_r, cw_i, dops_local, fs=fs, lo_rate=lo_rate,
            n_coherent=n_coherent, dop_chunk=dop_chunk,
            from_bits=from_bits, period=period, nf=nf, interpret=interpret)
        snr_g = jax.lax.all_gather(res.snr, "dop")    # [ndev, blk, n_sv]
        dop_g = jax.lax.all_gather(res.doppler_hz, "dop")
        lag_g = jax.lax.all_gather(res.ca_shift, "dop")
        idx = jnp.argmax(snr_g, axis=0)
        take = lambda a: jnp.take_along_axis(a, idx[None], 0)[0]
        return FoldedResult(take(snr_g), take(dop_g), take(lag_g))

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("blk"), P(), P(), P("dop")),
        out_specs=FoldedResult(P("blk"), P("blk"), P("blk")),
        check_vma=False)
    return fn(blocks, cw_r, cw_i, dops_hz)


def track_epochs_sharded(samples: jnp.ndarray, state, code_tables, *,
                         mesh: Mesh, axis: str = "blk", fs: float,
                         pll_gains, dll_gains):
    """Channel-sharded tracking: the channel bank split across devices.

    Channels are independent given the shared sample stream (replicated —
    it is small: 1 ms epochs), so the bank shards cleanly over one mesh
    axis: each device scans its slice of the ChannelState pytree.  The
    analog of model parallelism for the reference's 12 FPGA channel
    slices (reference: c/gps.h:17; fabric utilization
    "Homemade GPS Receiver.html":57).

    n_chan must divide by mesh.shape[axis].
    """
    from ..track.channel import track_epochs

    n_dev = mesh.shape[axis]
    n_chan = code_tables.shape[0]
    assert n_chan % n_dev == 0, (n_chan, n_dev)

    def body(samples, state, tables):
        return track_epochs(samples, state, tables, fs=fs,
                            pll_gains=pll_gains, dll_gains=dll_gains)

    state_spec = jax.tree.map(lambda _: P(axis), state)
    out_spec = jax.tree.map(lambda _: P(None, axis),
                            jax.eval_shape(body, samples, state,
                                           code_tables)[1])
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), state_spec, P(axis)),
        out_specs=(state_spec, out_spec),
        check_vma=False)
    return fn(samples, state, code_tables)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "lo_rate", "lags", "dop_chunk",
                                    "variant"))
def acquire_blocks_sharded(bits_blocks: jnp.ndarray, code_ffts: jnp.ndarray,
                           dops: jnp.ndarray, *, mesh: Mesh, lo_rate: float,
                           lags: int, dop_chunk: int = 16,
                           variant: str = "offline") -> AcqResult:
    """Block+Doppler sharded full front end for a batch of 1-bit blocks.

    ``bits_blocks``: ``[n_blk, fft_len]`` with n_blk divisible by
    mesh['blk'].  Each (blk, dop) device mixes and FFTs its blocks locally
    and searches its Doppler slice; results are ``[n_blk]`` AcqResults
    (per-block, per-SV bests).
    """
    n_blk = bits_blocks.shape[0]
    assert n_blk % mesh.shape["blk"] == 0
    assert dops.shape[0] % mesh.shape["dop"] == 0

    def body(bits_local, code_ffts, dops_local):
        iq = mix_baseband(bits_local, lo_rate, variant)
        data_ffts = jnp.fft.fft(iq, axis=-1)
        res = jax.vmap(
            lambda df: acquire_from_fft(df, code_ffts, dops_local,
                                        lags=lags, dop_chunk=dop_chunk)
        )(data_ffts)
        snr_g = jax.lax.all_gather(res.snr, "dop")       # [ndev, blk, n_sv]
        dop_g = jax.lax.all_gather(res.lo_shift, "dop")
        lag_g = jax.lax.all_gather(res.ca_shift, "dop")
        idx = jnp.argmax(snr_g, axis=0)
        take = lambda a: jnp.take_along_axis(a, idx[None], 0)[0]
        return AcqResult(take(snr_g), take(dop_g), take(lag_g))

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("blk"), P(), P("dop")),
        out_specs=AcqResult(P("blk"), P("blk"), P("blk")),
        check_vma=False)
    return fn(bits_blocks, code_ffts, dops)
