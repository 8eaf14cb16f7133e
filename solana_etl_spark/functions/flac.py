"""Vendored minimal pure-Python FLAC codec — the real decode path for
the crawl-dominant COMPRESSED lossless audio format.

Mirrors ``functions/wav.py``'s role: the multimodal kernels get a REAL
decode (magic + STREAMINFO parse, frame sync, CRC-8/CRC-16 verification,
rice-coded residual reconstruction, MD5 stream check) instead of a
deterministic stub, and a corrupt payload raises ValueError into the
pipeline's error isolation rather than faking samples. FLAC is the right
first compressed codec for this engine's bit-determinism contract:
lossless and integer-exact, so the DuckDB oracles can recompute every
downstream feature from the ground-truth sample arrays and a divergence
ANYWHERE in the bitstream walk fails the value hash — something lossy
MP3 could never offer.

Implements the subset produced by this module's own encoder and common
in the wild for speech-sized mono material (format layout follows the
public FLAC specification, RFC 9639 / xiph.org):

* mono, 16-bit streams (the same contract as ``wav.py``)
* CONSTANT, VERBATIM, FIXED-prediction (order 0-4) and LPC subframes —
  LPC is what real-world encoders emit almost exclusively, and its
  integer dot-product + arithmetic-shift prediction is exact in Python
  ints, so it fits the bit-determinism contract — with rice/rice2
  residual partitions including the escaped-raw form
* wasted-bits decode, metadata-block skip (PADDING etc.), CRC-8 frame
  headers, CRC-16 frame footers, and the STREAMINFO MD5 of the decoded
  stream (verified when present — the lossless proof)

Nothing here depends on any audio library: parsing is pure ``int``
bit-twiddling + ``numpy`` for the sample arrays.
"""

from __future__ import annotations

import hashlib
import struct

# Sample-count ceiling for untrusted payloads (decompression-bomb
# posture shared with wav.py/_MAX_PIXELS: declared sizes must never
# drive an unbounded allocation).
_MAX_SAMPLES = 256 * 1024 * 1024

# mimes this module can really decode — the multimodal capability gate
# routes ONLY these here; other compressed audio (mp3, ogg) keeps the
# deterministic stub rather than mis-parsing a lossy stream.
CAN_DECODE = ("audio/flac", "audio/x-flac")

_SYNC = 0x3FFE  # 14-bit frame sync code


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x^1+1 (0x07), init 0 — FLAC frame headers."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frames."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    """MSB-first bit reader over a bytes object."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos  # next byte index
        self.bits = 0  # bit accumulator
        self.nbits = 0  # bits available in accumulator

    def read(self, n: int) -> int:
        """n unsigned bits (MSB first); ValueError past end of data."""
        while self.nbits < n:
            if self.byte >= len(self.data):
                raise ValueError("flac: truncated bitstream")
            self.bits = (self.bits << 8) | self.data[self.byte]
            self.byte += 1
            self.nbits += 8
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the terminating 1 bit."""
        n = 0
        while self.read(1) == 0:
            n += 1
            if n > 1 << 20:
                raise ValueError("flac: unbounded unary code")
        return n

    def align(self) -> None:
        self.nbits = 0
        self.bits = 0

    def tell(self) -> int:
        """Byte offset of the next unread byte (only valid when
        byte-aligned)."""
        return self.byte


class _BitWriter:
    """MSB-first bit writer."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, value: int) -> None:
        while value >= 32:
            self.write(0, 32)
            value -= 32
        self.write(1, value + 1)  # `value` zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# fixed-predictor residual: residual[i] = sum of (-1)^j * C(o,j) * s[i-j]
# applied forward; reconstruction inverts it sample-by-sample
_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def _utf8_coded(value: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index)."""
    if value < 0x80:
        return bytes([value])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31)):
        if value < (1 << bits):
            out = bytearray()
            v = value
            for _ in range(nbytes - 1):
                out.insert(0, 0x80 | (v & 0x3F))
                v >>= 6
            out.insert(0, ((0xFF << (8 - nbytes)) & 0xFF) | v)
            return bytes(out)
    raise ValueError("flac: coded number out of range")


def _read_utf8_coded(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    ones = 0
    mask = 0x80
    while first & mask:
        ones += 1
        mask >>= 1
    if ones < 2 or ones > 7:
        raise ValueError("flac: bad coded number")
    value = first & (0xFF >> (ones + 1))
    for _ in range(ones - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad coded number continuation")
        value = (value << 6) | (b & 0x3F)
    return value


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _best_rice_k(us: list[int]) -> int:
    """Rice parameter minimizing the exact encoded bit count."""
    best_k, best_cost = 0, None
    for k in range(15):
        cost = sum((u >> k) + 1 + k for u in us)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        elif cost > best_cost * 2:
            break  # cost is convex in k; stop once clearly past the min
    return best_k


def _encode_subframe(
    bw: _BitWriter,
    block: list[int],
    force_verbatim: bool,
    lpc: tuple | None = None,
):
    """One mono 16-bit subframe: CONSTANT when flat, else the best FIXED
    order in {0,1,2} rice-coded (single partition), else VERBATIM.
    ``lpc=(coefs, shift)`` forces an LPC subframe with those quantized
    predictor coefficients (residuals computed forward — any
    coefficients are valid, compression just varies), used by fixtures
    to exercise the decode path real-world encoders emit."""
    n = len(block)
    if lpc is not None and n > len(lpc[0]):
        coefs, shift = lpc
        order = len(coefs)
        precision = max(2, max(abs(c).bit_length() for c in coefs) + 1)
        if precision > 15 or not (0 <= shift < 16):
            raise ValueError("flac: LPC parameters out of range")
        res = [
            block[i]
            - (
                sum(c * block[i - 1 - j] for j, c in enumerate(coefs))
                >> shift
            )
            for i in range(order, n)
        ]
        us = [(r << 1) if r >= 0 else ((-r << 1) - 1) for r in res]
        k = _best_rice_k(us)
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)  # LPC, order
        bw.write(0, 1)  # no wasted bits
        for s in block[:order]:  # warm-up
            bw.write(s & 0xFFFF, 16)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & ((1 << precision) - 1), precision)
        bw.write(0, 2)  # residual method: rice
        bw.write(0, 4)  # partition order 0
        bw.write(k, 4)
        for u in us:
            bw.write_unary(u >> k)
            if k:
                bw.write(u & ((1 << k) - 1), k)
        return
    if not force_verbatim and n and all(s == block[0] for s in block):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(block[0] & 0xFFFF, 16)
        return
    if force_verbatim or n < 3:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for s in block:
            bw.write(s & 0xFFFF, 16)
        return
    best = None
    for order in (0, 1, 2):
        coefs = _FIXED_COEFS[order]
        res = [
            block[i] - sum(c * block[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        cost = sum(abs(r) for r in res)
        if best is None or cost < best[2]:
            best = (order, res, cost)
    order, res, _ = best
    us = [(r << 1) if r >= 0 else ((-r << 1) - 1) for r in res]
    k = _best_rice_k(us)
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED, order
    bw.write(0, 1)  # no wasted bits
    for s in block[:order]:  # warm-up
        bw.write(s & 0xFFFF, 16)
    bw.write(0, 2)  # residual method: rice (4-bit params)
    bw.write(0, 4)  # partition order 0 → one partition
    bw.write(k, 4)
    for u in us:
        bw.write_unary(u >> k)
        if k:
            bw.write(u & ((1 << k) - 1), k)


def encode_pcm16(
    sample_rate: int,
    samples,
    block_size: int = 4096,
    force_verbatim: bool = False,
    padding: int = 0,
    lpc: tuple | None = None,
) -> bytes:
    """Canonical mono 16-bit FLAC bytes for an int sample sequence.

    ``force_verbatim`` disables prediction (byte-different encodings of
    identical PCM — the synthetic corpus's re-serve case, proving the
    decoder reconstructs samples instead of hashing bytes). ``padding``
    adds a PADDING metadata block of that many zero bytes (the FLAC
    analogue of wav.py's ``extra_chunks``). ``lpc=(coefs, shift)``
    writes LPC subframes with those quantized predictor coefficients —
    the subframe type real-world encoders emit almost exclusively."""
    samples = [int(s) for s in samples]
    if any(s > 32767 or s < -32768 for s in samples):
        raise ValueError("flac: sample out of int16 range")
    if not (0 < sample_rate < (1 << 20)):
        raise ValueError("flac: sample rate out of range")

    frames = bytearray()
    for idx, start in enumerate(range(0, max(len(samples), 1), block_size)):
        block = samples[start : start + block_size]
        if not block:
            break
        bw = _BitWriter()
        bw.write(_SYNC, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(0b0111, 4)  # blocksize: 16-bit value follows
        bw.write(0b0000, 4)  # sample rate: from STREAMINFO
        bw.write(0, 4)  # channel assignment: mono
        bw.write(0b100, 3)  # 16 bits per sample
        bw.write(0, 1)  # reserved
        for b in _utf8_coded(idx):
            bw.write(b, 8)
        bw.write(len(block) - 1, 16)
        bw.align()
        header = bw.bytes()
        bw.write(_crc8(header), 8)
        _encode_subframe(bw, block, force_verbatim, lpc=lpc)
        bw.align()
        body = bw.bytes()
        frames += body + struct.pack(">H", _crc16(body))

    md5 = hashlib.md5(
        b"".join(struct.pack("<h", s) for s in samples)
    ).digest()
    info = bytearray()
    info += struct.pack(">HH", block_size, block_size)
    info += b"\x00\x00\x00" * 2  # min/max framesize unknown
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | len(samples)
    info += packed.to_bytes(8, "big")  # rate(20) ch-1(3) bps-1(5) total(36)
    info += md5
    header_blocks = bytearray()
    last = 0x80 if padding <= 0 else 0x00
    header_blocks += bytes([last | 0]) + len(info).to_bytes(3, "big") + info
    if padding > 0:
        header_blocks += (
            bytes([0x80 | 1]) + padding.to_bytes(3, "big") + b"\x00" * padding
        )
    return b"fLaC" + bytes(header_blocks) + bytes(frames)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_subframe(br: _BitReader, blocksize: int) -> list[int]:
    if br.read(1) != 0:
        raise ValueError("flac: bad subframe padding bit")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps = 16 - wasted
    if bps <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if sf_type == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = [v] * blocksize
    elif sf_type == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        if order > blocksize:
            raise ValueError("flac: predictor order exceeds blocksize")
        out = [br.read_signed(bps) for _ in range(order)]
        out += [0] * (blocksize - order)
        _decode_residual(br, blocksize, order, out)
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            out[i] += sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
    elif sf_type >= 32:  # LPC, order = (type & 31) + 1
        order = (sf_type & 31) + 1
        if order > blocksize:
            raise ValueError("flac: predictor order exceeds blocksize")
        out = [br.read_signed(bps) for _ in range(order)]
        out += [0] * (blocksize - order)
        precision = br.read(4)
        if precision == 15:
            raise ValueError("flac: invalid LPC precision")
        precision += 1
        shift = br.read(5)
        if shift & 0x10:
            raise ValueError("flac: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        _decode_residual(br, blocksize, order, out)
        # prediction is an integer dot product arithmetic-shifted right —
        # exact in Python ints, so LPC decode stays bit-deterministic
        for i in range(order, blocksize):
            out[i] += (
                sum(c * out[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            )
    else:
        raise ValueError(f"flac: reserved subframe type {sf_type}")
    if wasted:
        out = [s << wasted for s in out]
    return out


def _decode_residual(
    br: _BitReader, blocksize: int, order: int, out: list[int]
) -> None:
    """Rice-coded residual into out[order:] (residual values, before
    prediction reconstruction)."""
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    param_bits, escape = (4, 15) if method == 0 else (5, 31)
    part_order = br.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("flac: bad residual partition order")
    idx = order
    for part in range(nparts):
        count = (blocksize >> part_order) - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("flac: bad residual partition order")
        k = br.read(param_bits)
        if k == escape:
            raw = br.read(5)
            for _ in range(count):
                out[idx] = br.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << k) | (br.read(k) if k else 0)
                out[idx] = (u >> 1) ^ -(u & 1)
                idx += 1


def decode(payload: bytes):
    """Parse a FLAC payload → ``(sample_rate: int, samples: np.ndarray)``
    (int64 values of the decoded 16-bit PCM stream).

    Verifies the frame-header CRC-8, the frame CRC-16, and — the
    lossless proof — the STREAMINFO MD5 of the decoded stream when
    present. Anything structurally wrong (bad magic, missing STREAMINFO,
    stereo/non-16-bit streams, LPC subframes, truncation, CRC or MD5
    mismatch, bomb-sized declared counts) raises ValueError so the
    pipeline's error isolation owns the row.
    """
    import numpy as np

    if len(payload) < 8 or payload[:4] != b"fLaC":
        raise ValueError("flac: not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata block header")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            streaminfo = body
        elif btype == 127:
            raise ValueError("flac: invalid metadata block type")
        pos += 4 + length
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("flac: missing or malformed STREAMINFO")
    packed = int.from_bytes(streaminfo[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    md5 = streaminfo[18:34]
    if rate <= 0:
        raise ValueError("flac: non-positive sample rate")
    if channels != 1 or bps != 16:
        raise ValueError(
            f"flac: unsupported stream (channels={channels} bps={bps}); "
            "only mono 16-bit"
        )
    if total > _MAX_SAMPLES:
        raise ValueError("flac: stream exceeds sample ceiling")

    samples: list[int] = []
    while pos < len(payload):
        frame_start = pos
        br = _BitReader(payload, pos)
        if br.read(14) != _SYNC:
            raise ValueError("flac: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        if chan != 0:
            raise ValueError("flac: unsupported channel assignment")
        if ss_code not in (0b000, 0b100):
            raise ValueError("flac: unsupported frame sample size")
        _read_utf8_coded(br)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code in (0b1100,):
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        elif sr_code == 0b1111:
            raise ValueError("flac: invalid sample rate code")
        header_end = br.tell()
        if _crc8(payload[frame_start:header_end]) != br.read(8):
            raise ValueError("flac: frame header CRC mismatch")
        if blocksize > _MAX_SAMPLES or len(samples) + blocksize > _MAX_SAMPLES:
            raise ValueError("flac: stream exceeds sample ceiling")
        samples.extend(_decode_subframe(br, blocksize))
        br.align()
        body_end = br.tell()
        if body_end + 2 > len(payload):
            raise ValueError("flac: truncated frame footer")
        want = struct.unpack(">H", payload[body_end : body_end + 2])[0]
        if _crc16(payload[frame_start:body_end]) != want:
            raise ValueError("flac: frame CRC mismatch")
        pos = body_end + 2

    if total and len(samples) != total:
        raise ValueError(
            f"flac: decoded {len(samples)} samples, STREAMINFO says {total}"
        )
    if md5 != b"\x00" * 16:
        got = hashlib.md5(
            b"".join(struct.pack("<h", s) for s in samples)
        ).digest()
        if got != md5:
            raise ValueError("flac: stream MD5 mismatch (corrupt samples)")
    return rate, np.asarray(samples, dtype=np.int64)
