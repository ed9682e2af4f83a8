"""A real FLAC codec, pure stdlib (round 5).

The free-lossless-audio bitstream, implemented from the public format
specification (RFC 9639 / the xiph.org spec — the reference library has
no media layer; this belongs to the multimodal-column seam the build
brief adds):

* container: ``fLaC`` marker + STREAMINFO metadata block (min/max block
  size, sample rate, channels, bits per sample, total samples, MD5 of
  the raw sample stream — verified on decode);
* frames: 14-bit sync, blocking strategy, coded block-size / sample-rate
  / sample-size fields, UTF-8-style coded frame number, CRC-8 header
  check and CRC-16 whole-frame check (both verified on decode);
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4 and LPC orders 1-32
  (quantized coefficients + arithmetic shift), each with the wasted-bits
  run-length header;
* residuals: partitioned Rice coding, 4-bit (method 0) and 5-bit
  (method 1) parameters, including the all-ones escape partitions that
  fall back to fixed-width raw residuals;
* stereo decorrelation: independent, left/side, right/side and mid/side
  (side channels carry bits-per-sample + 1, per the spec).

The encoder is a genuine FLAC encoder (it picks the cheapest of
constant / verbatim / fixed-order-0..4 per subframe, supports forced
subframe types, LPC with caller-supplied quantized coefficients,
partition orders, wasted-bits extraction, and all four stereo modes);
coefficient ESTIMATION (Levinson-Durbin / windowing) is a compression-
quality knob, not a correctness seam — decode implements full LPC
regardless of how coefficients were chosen.  No libFLAC exists in this
container (unlike giflib), so conformance rests on exhaustive
round-trips + corruption tests (tests/test_flac.py) and the gate's
closed-form DuckDB oracle over the decoded samples.
"""

from __future__ import annotations

import hashlib

# ----------------------------------------------------------------- CRCs

_CRC8_POLY = 0x07     # x^8 + x^2 + x + 1, MSB-first, init 0
_CRC16_POLY = 0x8005  # x^16 + x^15 + x^2 + 1, MSB-first, init 0


def _make_crc8_table() -> list[int]:
    t = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ _CRC8_POLY) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t.append(c)
    return t


def _make_crc16_table() -> list[int]:
    t = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ _CRC16_POLY) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        t.append(c)
    return t


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------- bit IO

class _BitWriter:
    """MSB-first bit accumulator (the FLAC bit order)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        self._acc = (self._acc << n) | (val & ((1 << n) - 1))
        self._n += n
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, val: int, n: int) -> None:
        self.write(val & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        # q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def getvalue(self) -> bytes:
        if self._n:
            raise ValueError("bitstream not byte-aligned")
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos  # byte position of the NEXT unread byte
        self._acc = 0
        self._n = 0

    def read(self, n: int) -> int:
        while self._n < n:
            if self.pos >= len(self.data):
                raise ValueError("FLAC: truncated bitstream")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= n
        out = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self._n -= self._n % 8
        # drop any partial bits (they must be zero padding)

    def at_eof(self) -> bool:
        return self.pos >= len(self.data) and self._n < 8


# ------------------------------------------------------- coded numbers

def _utf8_code(n: int) -> bytes:
    """FLAC's extended UTF-8-style coding for frame/sample numbers."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_bytes = 2
    while bits > (7 - n_bytes) + 6 * (n_bytes - 1) and n_bytes < 7:
        n_bytes += 1
    for _ in range(n_bytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF << (8 - n_bytes)) & 0xFF
    out.append(lead_mask | n)
    return bytes(reversed(out))


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_bytes = 0
    mask = 0x80
    while b0 & mask:
        n_bytes += 1
        mask >>= 1
    if n_bytes < 2 or n_bytes > 7:
        raise ValueError("FLAC: bad UTF-8 coded number")
    val = b0 & (0x7F >> n_bytes)
    for _ in range(n_bytes - 1):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


# ----------------------------------------------------------- predictors

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [samples[i] - sum(c * samples[i - 1 - j]
                             for j, c in enumerate(coefs))
            for i in range(order, len(samples))]


def _fixed_restore(warmup: list[int], resid: list[int],
                   order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    out = list(warmup)
    for e in resid:
        out.append(e + sum(c * out[len(out) - 1 - j]
                           for j, c in enumerate(coefs)))
    return out


def _lpc_residual(samples: list[int], coefs: list[int],
                  shift: int) -> list[int]:
    order = len(coefs)
    return [samples[i] - (sum(c * samples[i - 1 - j]
                              for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(samples))]


def _lpc_restore(warmup: list[int], resid: list[int], coefs: list[int],
                 shift: int) -> list[int]:
    out = list(warmup)
    for e in resid:
        out.append(e + (sum(c * out[len(out) - 1 - j]
                            for j, c in enumerate(coefs)) >> shift))
    return out


# ------------------------------------------------------- rice residuals

def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _rice_cost(resid: list[int], k: int) -> int:
    return sum((_zigzag(v) >> k) + 1 + k for v in resid)


def _best_rice_k(resid: list[int], max_k: int) -> int:
    best_k, best_c = 0, None
    for k in range(max_k + 1):
        c = _rice_cost(resid, k)
        if best_c is None or c < best_c:
            best_k, best_c = k, c
    return best_k


def _write_residual(w: _BitWriter, resid: list[int], order: int,
                    block_size: int, partition_order: int,
                    method: int = 0, force_escape: bool = False) -> None:
    """Partitioned Rice residual (coding methods 0 / 1)."""
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    w.write(method, 2)
    w.write(partition_order, 4)
    n_part = 1 << partition_order
    part_len = block_size >> partition_order
    for p in range(n_part):
        # partitions tile the FRAME's sample positions; the first one
        # loses the warmup samples, so residual index = sample index -
        # order throughout
        start = 0 if p == 0 else p * part_len - order
        cnt = part_len - (order if p == 0 else 0)
        part = resid[start:start + cnt]
        if force_escape:
            raw = max((abs(v).bit_length() + 1 for v in part), default=1)
            w.write(escape, kbits)
            w.write(raw, 5)
            for v in part:
                w.write_signed(v, raw)
            continue
        k = _best_rice_k(part, escape - 1)
        w.write(k, kbits)
        for v in part:
            u = _zigzag(v)
            w.write_unary(u >> k)
            w.write(u & ((1 << k) - 1), k)


def _read_residual(r: _BitReader, order: int,
                   block_size: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    partition_order = r.read(4)
    n_part = 1 << partition_order
    if block_size % n_part:
        raise ValueError("FLAC: block size not divisible by partitions")
    out: list[int] = []
    for p in range(n_part):
        cnt = block_size >> partition_order
        if p == 0:
            cnt -= order
        k = r.read(kbits)
        if k == escape:
            raw = r.read(5)
            out.extend(r.read_signed(raw) if raw else 0
                       for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = r.read_unary()
                u = (q << k) | (r.read(k) if k else 0)
                out.append(_unzigzag(u))
    return out


# -------------------------------------------------------------- subframes

def _wasted_bits(samples: list[int]) -> int:
    w = None
    for s in samples:
        if s == 0:
            continue
        tz = (s & -s).bit_length() - 1
        w = tz if w is None else min(w, tz)
        if w == 0:
            return 0
    return w or 0


def _write_subframe(w: _BitWriter, samples: list[int], bps: int,
                    block_size: int, partition_order: int,
                    force: tuple | None = None,
                    force_escape: bool = False) -> None:
    wasted = _wasted_bits(samples) if force is None else 0
    if wasted:
        samples = [s >> wasted for s in samples]
        bps -= wasted

    def header(type_code: int) -> None:
        w.write(0, 1)
        w.write(type_code, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if force is not None and force[0] == "lpc":
        _, coefs, shift, precision = force
        order = len(coefs)
        header(0b100000 | (order - 1))
        for s in samples[:order]:
            w.write_signed(s, bps)
        w.write(precision - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write_signed(c, precision)
        _write_residual(w, _lpc_residual(samples, coefs, shift), order,
                        block_size, partition_order, force_escape=force_escape)
        return
    if force is not None and force[0] == "verbatim":
        header(0b000001)
        for s in samples:
            w.write_signed(s, bps)
        return
    if force is not None and force[0] == "constant":
        if any(s != samples[0] for s in samples):
            raise ValueError("constant subframe over varying samples")
        header(0b000000)
        w.write_signed(samples[0], bps)
        return
    if force is not None and force[0] == "fixed":
        order = force[1]
        header(0b001000 | order)
        for s in samples[:order]:
            w.write_signed(s, bps)
        _write_residual(w, _fixed_residual(samples, order), order,
                        block_size, partition_order, force_escape=force_escape)
        return

    # automatic choice: constant, else cheapest fixed order vs verbatim
    if all(s == samples[0] for s in samples):
        header(0b000000)
        w.write_signed(samples[0], bps)
        return
    best_order, best_cost = 0, None
    for order in range(min(4, len(samples) - 1) + 1):
        resid = _fixed_residual(samples, order)
        cost = order * bps + _rice_cost(
            resid, _best_rice_k(resid, 14))
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    if best_cost is not None and best_cost < len(samples) * bps:
        order = best_order
        header(0b001000 | order)
        for s in samples[:order]:
            w.write_signed(s, bps)
        _write_residual(w, _fixed_residual(samples, order), order,
                        block_size, partition_order)
    else:
        header(0b000001)
        for s in samples:
            w.write_signed(s, bps)


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if t == 0b000000:
        out = [r.read_signed(bps)] * block_size
    elif t == 0b000001:
        out = [r.read_signed(bps) for _ in range(block_size)]
    elif 0b001000 <= t <= 0b001100:
        order = t & 0x07
        warmup = [r.read_signed(bps) for _ in range(order)]
        out = _fixed_restore(warmup, _read_residual(r, order, block_size),
                             order)
    elif t & 0b100000:
        order = (t & 0x1F) + 1
        warmup = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision code")
        shift = r.read(5)
        coefs = [r.read_signed(precision) for _ in range(order)]
        out = _lpc_restore(warmup, _read_residual(r, order, block_size),
                           coefs, shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {t:#08b}")
    if wasted:
        out = [s << wasted for s in out]
    return out


# ------------------------------------------------------------ stream level

_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}


def _samples_md5(channels: list[list[int]], bps: int) -> bytes:
    nbytes = (bps + 7) // 8
    m = hashlib.md5()
    n = len(channels[0])
    for i in range(n):
        for ch in channels:
            m.update(int(ch[i]).to_bytes(nbytes, "little", signed=True))
    return m.digest()


def encode_flac(channels: list[list[int]] | list[int], rate: int = 8000,
                bps: int = 16, block_size: int = 4096,
                stereo_mode: str = "independent",
                partition_order: int = 0,
                force: tuple | None = None,
                force_escape: bool = False) -> bytes:
    """Encode PCM into a real FLAC stream.

    ``channels`` — a flat list (mono) or per-channel lists (equal
    lengths).  ``stereo_mode`` — independent / left_side / right_side /
    mid_side.  ``force`` — optional subframe override applied to every
    subframe: ("constant",) / ("verbatim",) / ("fixed", order) /
    ("lpc", coefs, shift, precision).  ``partition_order`` applies where
    the partition count divides the block and leaves the first partition
    non-empty, else falls back to 0 for that frame.
    """
    if channels and isinstance(channels[0], int):
        channels = [list(channels)]
    channels = [list(c) for c in channels]
    n_ch = len(channels)
    if n_ch not in (1, 2):
        raise ValueError("1 or 2 channels supported")
    if stereo_mode not in ("independent", "left_side", "right_side",
                           "mid_side"):
        raise ValueError(stereo_mode)
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channel length mismatch")
    if n == 0:
        raise ValueError("empty stream")

    out = bytearray(b"fLaC")
    sizes = [min(block_size, n - s) for s in range(0, n, block_size)]
    info = _BitWriter()
    info.write(min(sizes), 16)           # min block size (last may be short)
    info.write(max(sizes), 16)           # max block size
    info.write(0, 24)                    # min frame size (unknown)
    info.write(0, 24)                    # max frame size (unknown)
    info.write(rate, 20)
    info.write(n_ch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    body = info.getvalue() + _samples_md5(channels, bps)
    out.append(0x80)                     # last-metadata-block | STREAMINFO
    out.extend(len(body).to_bytes(3, "big"))
    out.extend(body)

    frame_no = 0
    for start in range(0, n, block_size):
        blk = [c[start:start + block_size] for c in channels]
        bs = len(blk[0])
        po = partition_order
        if (bs % (1 << po)) or (bs >> po) <= 4:
            po = 0
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)                    # reserved
        w.write(0, 1)                    # fixed-blocksize stream
        if bs == block_size and block_size == 192:
            bs_code, bs_tail = 1, None
        elif bs <= 256:
            bs_code, bs_tail = 6, ("u8", bs - 1)
        else:
            bs_code, bs_tail = 7, ("u16", bs - 1)
        w.write(bs_code, 4)
        rate_code = _RATE_CODES.get(rate, 0)
        w.write(rate_code, 4)
        if n_ch == 1 or stereo_mode == "independent":
            chan_code = n_ch - 1
            sub = blk
            side_flags = [False] * n_ch
        elif stereo_mode == "left_side":
            chan_code = 8
            sub = [blk[0], [a - b for a, b in zip(blk[0], blk[1])]]
            side_flags = [False, True]
        elif stereo_mode == "right_side":
            chan_code = 9
            sub = [[a - b for a, b in zip(blk[0], blk[1])], blk[1]]
            side_flags = [True, False]
        else:                            # mid_side
            chan_code = 10
            sub = [[(a + b) >> 1 for a, b in zip(blk[0], blk[1])],
                   [a - b for a, b in zip(blk[0], blk[1])]]
            side_flags = [False, True]
        w.write(chan_code, 4)
        w.write(_BPS_CODES[bps], 3)
        w.write(0, 1)                    # reserved
        for byte in _utf8_code(frame_no):
            w.write(byte, 8)
        if bs_tail is not None:
            w.write(bs_tail[1], 8 if bs_tail[0] == "u8" else 16)
        header = w.getvalue()
        w.write(crc8(header), 8)
        for ch, is_side in zip(sub, side_flags):
            _write_subframe(w, ch, bps + (1 if is_side else 0), bs, po,
                            force=force, force_escape=force_escape)
        w.align()
        frame = w.getvalue()
        out.extend(frame)
        out.extend(crc16(frame).to_bytes(2, "big"))
        frame_no += 1
    return bytes(out)


def decode_flac(data: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode a FLAC stream -> (rate, bps, per-channel samples).

    Verifies the sync code, header CRC-8, frame CRC-16 and the
    STREAMINFO MD5 (when present) — a corrupted stream raises."""
    if data[:4] != b"fLaC":
        raise ValueError("FLAC: bad stream marker")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        hdr = data[pos]
        size = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + size]
        if (hdr & 0x7F) == 0:
            if size < 34:
                raise ValueError("FLAC: short STREAMINFO")
            br = _BitReader(body)
            br.read(16); br.read(16); br.read(24); br.read(24)
            rate = br.read(20)
            n_ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, n_ch, bps, total, body[18:34])
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    rate, n_ch, bps, total, md5_expect = info

    channels: list[list[int]] = [[] for _ in range(n_ch)]
    got = 0
    while got < total:
        frame_start = pos
        r = _BitReader(data, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        r.read(1)
        r.read(1)                        # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)
        _utf8_decode(r)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        hdr_end = r.pos
        if crc8(data[frame_start:hdr_end]) != r.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        f_bps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(bps_code)
        if f_bps is None:
            raise ValueError("FLAC: reserved sample size code")
        if chan_code <= 7:
            subs = [_read_subframe(r, bs, f_bps)
                    for _ in range(chan_code + 1)]
            frame_ch = subs
        elif chan_code in (8, 9, 10):
            a = _read_subframe(r, bs, f_bps + (1 if chan_code == 9 else 0))
            b = _read_subframe(r, bs, f_bps + (1 if chan_code != 9 else 0))
            if chan_code == 8:           # left/side
                frame_ch = [a, [x - s for x, s in zip(a, b)]]
            elif chan_code == 9:         # right/side (a=side, b=right)
                frame_ch = [[x + s for x, s in zip(b, a)], b]
            else:                        # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                frame_ch = [left, right]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if len(frame_ch) != n_ch:
            raise ValueError("FLAC: channel count changed mid-stream")
        r.align()
        crc_calc = crc16(data[frame_start:r.pos])
        if crc_calc != r.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c, s in zip(channels, frame_ch):
            c.extend(s)
        got += bs
        pos = r.pos
    for c in channels:
        del c[total:]
    if md5_expect != b"\x00" * 16 and \
            _samples_md5(channels, bps) != md5_expect:
        raise ValueError("FLAC: STREAMINFO MD5 mismatch")
    return rate, bps, channels
