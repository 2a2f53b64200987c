"""Sample-stream sources: the real-vs-replay backend pair.

The reference's only backend abstraction is two compilation units sharing
one math core: ``search.cpp`` pulls 1-bit samples from the FPGA over SPI,
``search_offline.cpp`` freads them from a capture file (SURVEY §4: its
only "mock" mechanism).  Here the seam is an explicit source interface
producing complex-baseband blocks, with:

* :class:`FileSource1Bit` — bit-packed capture replay (the offline path),
  using the native C++ unpacker when available.
* :class:`IQFileSource` — int8/uint8 interleaved I/Q replay.
* :class:`SynthSource` — a live-signal simulator (the rig-less analog of
  the live path): SVs with Doppler/code-phase/NAV ground truth generated
  on the fly.
* :class:`Prefetcher` — background-thread double buffering so host decode
  overlaps device compute (the SPI-pipelining analog,
  reference: c/spi.cpp:34-53).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from ..config import ReceiverConfig
from . import loaders


class SampleSource:
    """Iterator of complex64 baseband blocks of a fixed length."""

    fs: float

    def blocks(self, block_len: int) -> Iterator[np.ndarray]:
        raise NotImplementedError


class ArraySource(SampleSource):
    """Wrap a host complex-baseband array as a source (process_iq path).

    Unlike the file sources, the FINAL partial block (>= 1 ms) is also
    yielded so an array's trailing epochs are processed, matching the
    old whole-array semantics.
    """

    def __init__(self, data: np.ndarray, fs: float):
        self.data = np.asarray(data)
        self.fs = fs

    def blocks(self, block_len: int) -> Iterator[np.ndarray]:
        p = round(self.fs * 1e-3)
        for i in range(0, len(self.data), block_len):
            blk = self.data[i: i + block_len]
            if len(blk) < p:
                return
            yield blk


class FileSource1Bit(SampleSource):
    """Replay a bit-packed 1-bit IF capture as baseband blocks.

    Mixing uses the offline LO tables with per-block phase restart when
    ``per_block_phase`` (golden-compatible with the reference's Sample())
    or a continuous LO phase otherwise (better for tracking).
    """

    def __init__(self, path: str, cfg: ReceiverConfig,
                 per_block_phase: bool = False):
        self.path = path
        self.cfg = cfg
        self.fs = cfg.fs
        self.per_block_phase = per_block_phase

    def bit_blocks(self, block_len: int) -> Iterator[np.ndarray]:
        """Raw {0,1} sample blocks (uint8), for device-side mixing.

        8x the packed file size but 8x smaller than complex64 — the
        receiver's fast path transfers these and runs the quadrature mix
        on device (tpu_gnss.acquire.search.mix_baseband with a running
        sample offset), keeping the host loop at I/O speed.
        """
        assert block_len % 8 == 0
        with open(self.path, "rb") as f:
            while True:
                raw = f.read(block_len // 8)
                if len(raw) < block_len // 8:
                    return
                yield loaders.unpack_1bit(raw)

    def packed_blocks(self, block_len: int) -> Iterator[np.ndarray]:
        """Packed uint32 word blocks — the file's own bytes, zero-copy.

        The fastest path of all: 1 bit/sample crosses the host->device
        link (8x less than bit_blocks, 64x less than int8 planes) and
        the unpack+mix runs on device (tpu_gnss.ops.onebit.mix_packed).
        Requires ``block_len % 32 == 0`` so chunks stay word-aligned.
        """
        assert block_len % 32 == 0
        from ..ops.onebit import packed_words_from_file_bytes
        with open(self.path, "rb") as f:
            while True:
                raw = f.read(block_len // 8)
                if len(raw) < block_len // 8:
                    return
                yield packed_words_from_file_bytes(raw)

    def blocks(self, block_len: int) -> Iterator[np.ndarray]:
        assert block_len % 8 == 0
        sample0 = 0
        with open(self.path, "rb") as f:
            while True:
                raw = f.read(block_len // 8)
                if len(raw) < block_len // 8:
                    return
                bits = loaders.unpack_1bit(raw)
                # one source of truth for the front-end mix (loaders);
                # phase restarts per block or runs continuously
                yield loaders.mix_1bit_block(
                    bits, self.cfg,
                    sample0=0 if self.per_block_phase else sample0)
                sample0 += block_len


class IQFileSource(SampleSource):
    """Replay an interleaved I/Q capture (int8 HackRF / uint8 rtl-sdr)."""

    def __init__(self, path: str, fs: float, dtype: str = "int8",
                 remove_dc: bool = True):
        self.path = path
        self.fs = fs
        self.dtype = dtype
        self.remove_dc = remove_dc

    def blocks(self, block_len: int) -> Iterator[np.ndarray]:
        item = np.dtype(np.int8 if self.dtype == "int8" else np.uint8)
        with open(self.path, "rb") as f:
            while True:
                raw = f.read(2 * block_len * item.itemsize)
                if len(raw) < 2 * block_len * item.itemsize:
                    return
                a = np.frombuffer(raw, dtype=item).astype(np.float32)
                if self.dtype == "uint8":
                    a = a - 128.0
                y = a[0::2] + 1j * a[1::2]
                if self.remove_dc:
                    y = y - y.mean()
                yield y.astype(np.complex64)


class SynthSource(SampleSource):
    """Live-signal simulator: generates baseband blocks on demand."""

    def __init__(self, svs: Sequence, fs: float, noise_std: float = 0.5,
                 seed: int = 0):
        from ..signal import synth
        self._synth = synth
        self.svs = list(svs)
        self.fs = fs
        self.noise_std = noise_std
        self.seed = seed

    def blocks(self, block_len: int) -> Iterator[np.ndarray]:
        # synthesize lazily in whole blocks with continuous phase by
        # offsetting each SV's code/carrier phase per block
        from ..constants import CHIP_RATE_HZ, L1_HZ
        import dataclasses
        n0 = 0
        rng = np.random.default_rng(self.seed)
        while True:
            svs_shifted = []
            t0 = n0 / self.fs
            for sv in self.svs:
                rate = CHIP_RATE_HZ * (1.0 + sv.doppler_hz / L1_HZ)
                svs_shifted.append(dataclasses.replace(
                    sv,
                    code_phase_chips=sv.code_phase_chips + rate * t0,
                    carrier_phase_cycles=(sv.carrier_phase_cycles
                                          + sv.doppler_hz * t0) % 1.0))
            blk = self._synth.synth_baseband(
                svs_shifted, self.fs, block_len, noise_std=0.0)
            if self.noise_std > 0:
                blk = blk + (self.noise_std / np.sqrt(2.0)) * (
                    rng.standard_normal(block_len)
                    + 1j * rng.standard_normal(block_len)).astype(np.complex64)
            yield blk.astype(np.complex64)
            n0 += block_len


class Prefetcher:
    """Background-thread block prefetch (double/triple buffering).

    ``mode``: "iq" (complex blocks), "bits" (unpacked {0,1} samples), or
    "packed" (uint32 words, 1 bit/sample — the cheapest link format).
    """

    def __init__(self, source: SampleSource, block_len: int, depth: int = 3,
                 bits: bool = False, mode: Optional[str] = None):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._src = source
        self._block_len = block_len
        self._mode = mode or ("bits" if bits else "iq")
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _pump(self):
        try:
            name = {"bits": "bit_blocks", "packed": "packed_blocks",
                    "iq": "blocks"}[self._mode]
            it = getattr(self._src, name)(self._block_len)
            for blk in it:
                self._q.put(blk)
        except BaseException as exc:  # re-raised in the consumer
            self._err = exc
        finally:
            self._q.put(None)

    def __iter__(self):
        while True:
            blk = self._q.get()
            if blk is None:
                # a reader failure must not masquerade as a clean EOF
                err = getattr(self, "_err", None)
                if err is not None:
                    raise err
                return
            yield blk
