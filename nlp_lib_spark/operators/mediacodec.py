"""Pure-stdlib/numpy media codecs for the ``mode="real"`` decode path.

The container has no PIL/librosa/pyav (verified at round-3 start, recorded
in BASELINE.md), but four real, widely-used container formats ARE decodable
with what IS baked in: uncompressed 24-bit BMP (struct parsing), gray8 PNG
(stdlib ``zlib`` inflate + full five-filter scanline reconstruction),
PCM16 WAV (stdlib ``wave``), and uncompressed-DIB AVI (RIFF chunk walk +
per-frame DIB decode — a genuine video demuxer, so frame sampling is a
real operation, not a stub). This module provides symmetric
encoders/decoders so the ``extract_media_features(mode="real")`` seam
(operators/multimodal.py) performs a genuine decode — magic-byte dispatch,
header parsing, row-padding/bottom-up handling, filter reconstruction,
sample extraction — rather than a stub. Compressed video codecs (H.264
etc.) remain out of scope: no stdlib decoder exists.

Feature vectors are integer-valued floats so the driver's value-hash
compares exactly (no float formatting divergence):

* image  -> [w, h, min, max, sum] + 4x4 nearest-neighbor resize (16 grays)
* audio  -> [rate, n_samples, min, max, sum(|s|)] + first 16 samples

Scale posture: encode/decode run inside Arrow ``mapInPandas`` batches;
payload bytes never leave the executor, and per-row work is O(payload).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

RESIZE_N = 4  # 4x4 nearest-neighbor thumbnail
_N_SAMPLES_FEAT = 16


def md5_expand(text: str, n: int) -> bytes:
    """Deterministic byte expansion used by the synthetic payload builders
    and mirrored closed-form by the DuckDB oracle: block 0 = md5(text),
    block k = md5(text + ':' + k)."""
    out = bytearray()
    blk = 0
    while len(out) < n:
        key = text if blk == 0 else f"{text}:{blk}"
        out.extend(hashlib.md5(key.encode("utf-8")).digest())
        blk += 1
    return bytes(out[:n])


# ----------------------------------------------------- DIB pixel array (24bpp)
# Shared by BMP files and AVI '00db' frame chunks — both carry the same
# uncompressed BGR pixel array (bottom-up rows padded to 4-byte boundaries).

def _dib_stride(width: int) -> int:
    return (width * 3 + 3) // 4 * 4


def _pack_dib(gray: list[int], width: int, height: int) -> bytes:
    """gray raster (row 0 = TOP) -> bottom-up padded BGR pixel array."""
    if len(gray) != width * height:
        raise ValueError("pixel count != width*height")
    row_stride = _dib_stride(width)
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for c in range(width):
            v = gray[r * width + c]
            row += bytes((v, v, v))  # BGR
        row += b"\x00" * (row_stride - len(row))
        body += row
    return bytes(body)


def _unpack_dib(data: bytes, off: int, width: int, height: int,
                top_down: bool = False) -> list[int]:
    """Padded BGR pixel array -> gray raster (row 0 = TOP)."""
    row_stride = _dib_stride(width)
    gray: list[int] = [0] * (width * height)
    for i in range(height):
        src_row = i if top_down else height - 1 - i
        base = off + src_row * row_stride
        for c in range(width):
            b, g, r = data[base + 3 * c:base + 3 * c + 3]
            gray[i * width + c] = (r + g + b) // 3
    return gray


# --------------------------------------------------------------- BMP (24bpp)

def encode_bmp(gray: list[int], width: int, height: int) -> bytes:
    """Write an uncompressed 24-bit BMP (gray pixels r=g=b, standard
    bottom-up row order, rows padded to 4-byte boundaries). ``gray`` is
    raster order: row 0 = TOP row."""
    body = _pack_dib(gray, width, height)
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    return hdr + info + body


def decode_bmp(data: bytes) -> tuple[int, int, list[int]]:
    """Parse an uncompressed 24-bit BMP -> (width, height, gray pixels in
    raster order, row 0 = top). Handles bottom-up (positive height) and
    top-down (negative height) files and arbitrary pixel-array offsets."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    return width, height, _unpack_dib(data, off, width, height, top_down)


def image_features(data: bytes) -> list[float]:
    w, h, gray = decode_image(data)
    resized = [gray[(i * h // RESIZE_N) * w + (j * w // RESIZE_N)]
               for i in range(RESIZE_N) for j in range(RESIZE_N)]
    return [float(x) for x in
            (w, h, min(gray), max(gray), sum(gray), *resized)]


# ----------------------------------------------------------- PNG (grayscale 8)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(gray: list[int], width: int, height: int) -> bytes:
    """Write a real compressed PNG: 8-bit grayscale (color type 0), no
    interlace. Scanline ``r`` is filtered with type ``r % 5``, so decoding
    a multi-row image must reconstruct through ALL five PNG filters
    (None/Sub/Up/Average/Paeth) — the decoder can't shortcut. IDAT is
    split in two chunks because real encoders emit multiple IDATs and a
    correct reader must concatenate before inflating."""
    if len(gray) != width * height:
        raise ValueError("pixel count != width*height")
    raw = bytearray()
    prior = bytes(width)
    for r in range(height):
        row = bytes(gray[r * width:(r + 1) * width])
        f = r % 5
        raw.append(f)
        for i in range(width):
            a = row[i - 1] if i else 0
            b, c = prior[i], (prior[i - 1] if i else 0)
            x = row[i]
            if f == 0:
                v = x
            elif f == 1:
                v = x - a
            elif f == 2:
                v = x - b
            elif f == 3:
                v = x - (a + b) // 2
            else:
                v = x - _paeth(a, b, c)
            raw.append(v & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    comp = zlib.compress(bytes(raw), 6)
    mid = max(1, len(comp) // 2)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", comp[:mid])
            + _png_chunk(b"IDAT", comp[mid:])
            + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> tuple[int, int, list[int]]:
    """Parse an 8-bit grayscale non-interlaced PNG -> (width, height, gray
    raster, row 0 = top): chunk walk, IDAT concatenation, zlib inflate,
    and per-scanline reconstruction of all five filter types."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height = 8, None, None
    idat = bytearray()
    while pos + 8 <= len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + tag + body + CRC
        if tag == b"IHDR":
            width, height, depth, color, comp_m, filt_m, il = (
                struct.unpack(">IIBBBBB", body))
            if (depth, color, comp_m, filt_m, il) != (8, 0, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={color} "
                    f"interlace={il} (gray8 non-interlaced only)")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (width + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    gray: list[int] = [0] * (width * height)
    prior = bytes(width)
    for r in range(height):
        f = raw[r * (width + 1)]
        line = raw[r * (width + 1) + 1:(r + 1) * (width + 1)]
        rec = bytearray(width)
        for i in range(width):
            a = rec[i - 1] if i else 0
            b, c = prior[i], (prior[i - 1] if i else 0)
            x = line[i]
            if f == 0:
                v = x
            elif f == 1:
                v = x + a
            elif f == 2:
                v = x + b
            elif f == 3:
                v = x + (a + b) // 2
            elif f == 4:
                v = x + _paeth(a, b, c)
            else:
                raise ValueError(f"bad PNG filter type {f}")
            rec[i] = v & 0xFF
        gray[r * width:(r + 1) * width] = rec
        prior = bytes(rec)
    return width, height, gray


def decode_image(data: bytes) -> tuple[int, int, list[int]]:
    """Magic-byte dispatch over the still-image decoders."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == PNG_SIG:
        return decode_png(data)
    raise ValueError("unsupported image container (BMP / gray8 PNG)")


# --------------------------------------------------- AVI (uncompressed 'DIB ')

def _iter_riff(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) over a RIFF chunk run; chunks are
    word-aligned (odd sizes carry a pad byte)."""
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        ln = struct.unpack_from("<I", data, pos + 4)[0]
        yield tag, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def encode_avi(frames: list[list[int]], width: int, height: int,
               fps: int = 10) -> bytes:
    """Write a minimal standards-shaped uncompressed AVI: RIFF('AVI ') with
    a LIST('hdrl') carrying avih + LIST('strl'){strh('vids'/'DIB '), strf
    (BITMAPINFOHEADER, 24bpp, BI_RGB)} and a LIST('movi') of one '00db'
    chunk per frame (same DIB pixel array a BMP carries)."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    bodies = [_pack_dib(f, width, height) for f in frames]
    frame_size = len(bodies[0])
    us_per_frame = 1_000_000 // fps
    avih = struct.pack("<14I", us_per_frame, frame_size * fps, 0, 0x10,
                       len(frames), 0, 1, frame_size, width, height,
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0,
                                            1, fps, 0, len(frames),
                                            frame_size, 0xFFFFFFFF, 0,
                                            0, 0, width, height))
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       frame_size, 2835, 2835, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) \
        + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl_body = (b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
                 + strl)
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = bytearray(b"movi")
    for b in bodies:
        movi_body += b"00db" + struct.pack("<I", len(b)) + b
        if len(b) & 1:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes) -> tuple[int, int, list[list[int]]]:
    """Demux an uncompressed-DIB AVI -> (width, height, frames as gray
    rasters): RIFF walk, BITMAPINFOHEADER from LIST hdrl/strl/strf,
    frames from the LIST movi '00db'/'00dc' chunks."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    riff_len = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_len)
    width = height = None
    frames: list[list[int]] = []
    frame_chunks: list[tuple[int, int]] = []
    for tag, body, ln in _iter_riff(data, 12, end):
        if tag != b"LIST":
            continue
        list_type = data[body:body + 4]
        if list_type == b"hdrl":
            for t2, b2, l2 in _iter_riff(data, body + 4, body + ln):
                if t2 == b"LIST" and data[b2:b2 + 4] == b"strl":
                    for t3, b3, l3 in _iter_riff(data, b2 + 4, b2 + l2):
                        if t3 == b"strf":
                            (_, width, height, _, bpp, comp) = (
                                struct.unpack_from("<IiiHHI", data, b3))
                            if bpp != 24 or comp != 0:
                                raise ValueError(
                                    f"unsupported AVI stream: bpp={bpp} "
                                    f"compression={comp}")
        elif list_type == b"movi":
            for t2, b2, l2 in _iter_riff(data, body + 4, body + ln):
                if t2 in (b"00db", b"00dc"):
                    frame_chunks.append((b2, l2))
    if width is None:
        raise ValueError("AVI missing strf header")
    if height < 0:
        raise ValueError("top-down AVI frames unsupported")
    for b2, l2 in frame_chunks:
        if l2 != _dib_stride(width) * height:
            raise ValueError("AVI frame chunk size mismatch")
        frames.append(_unpack_dib(data, b2, width, height))
    return width, height, frames


def frame_features(data: bytes, every_n: int = 1) -> list[tuple[int, list[float]]]:
    """Demux + sample every ``every_n``-th frame -> per-frame feature rows
    (frame_idx, [w, h, min, max, sum] + 4x4 nearest-neighbor resize) — the
    same feature contract as still images, per sampled frame."""
    w, h, frames = decode_avi(data)
    out = []
    for k in range(0, len(frames), every_n):
        gray = frames[k]
        resized = [gray[(i * h // RESIZE_N) * w + (j * w // RESIZE_N)]
                   for i in range(RESIZE_N) for j in range(RESIZE_N)]
        out.append((k, [float(x) for x in
                        (w, h, min(gray), max(gray), sum(gray), *resized)]))
    return out


def video_features(data: bytes) -> list[float]:
    """Whole-clip summary vector: [w, h, n_frames, min, max, sum] over all
    frames' pixels."""
    w, h, frames = decode_avi(data)
    allpx = [v for f in frames for v in f]
    return [float(x) for x in
            (w, h, len(frames), min(allpx), max(allpx), sum(allpx))]


# --------------------------------------------------------------- WAV (PCM16)

def encode_wav(samples: list[int], rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """Parse PCM16 mono WAV -> (sample_rate, samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("unsupported WAV layout")
        n = w.getnframes()
        samples = list(struct.unpack(f"<{n}h", w.readframes(n)))
        return w.getframerate(), samples


def audio_features(data: bytes) -> list[float]:
    rate, s = decode_wav(data)
    head = (s + [0] * _N_SAMPLES_FEAT)[:_N_SAMPLES_FEAT]
    return [float(x) for x in
            (rate, len(s), min(s), max(s), sum(abs(v) for v in s), *head)]


def real_features(data: bytes) -> list[float]:
    """Magic-byte dispatch for the real decode seam."""
    if data[:2] == b"BM" or data[:8] == PNG_SIG:
        return image_features(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return audio_features(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return video_features(data)
    raise ValueError("unsupported media container (BMP, gray8 PNG, PCM16 "
                     "WAV and uncompressed-DIB AVI are the decoders "
                     "available without optional codec deps)")


# ------------------------------------------------- synthetic payload builder

def synth_payload(doc_id: int, text: str) -> tuple[str, bytes]:
    """Deterministic real-container payload from a document row (the gate's
    input builder, mirrored closed-form by the media_features_real oracle):
    even doc_id -> 8x4 gray BMP, odd -> 16-sample PCM16 WAV @8kHz, pixel /
    sample material = md5_expand(text, 32)."""
    b = md5_expand(text, 32)
    if doc_id % 2 == 0:
        return "image", encode_bmp(list(b), 8, 4)
    samples = [b[2 * k] * 256 + b[2 * k + 1] - 32768 for k in range(16)]
    return "audio", encode_wav(samples, 8000)


PNG_DIM = 8       # synth PNG: 8x8 gray (64 bytes = 4 md5 blocks)
AVI_FRAMES = 4    # synth AVI: 4 frames of 8x4
AVI_W, AVI_H = 8, 4


def synth_png_payload(text: str) -> bytes:
    """Deterministic PNG payload (gate input builder, mirrored closed-form
    by the media_features_png oracle): 8x8 gray8 PNG whose raster is
    md5_expand(text, 64). With 8 scanlines every PNG filter type (r % 5)
    is exercised on every payload."""
    return encode_png(list(md5_expand(text, PNG_DIM * PNG_DIM)),
                      PNG_DIM, PNG_DIM)


def synth_avi_payload(text: str) -> bytes:
    """Deterministic AVI payload (gate input builder, mirrored closed-form
    by the media_frames_avi oracle): AVI_FRAMES frames of 8x4 gray, frame
    k's raster = md5_expand(text + '#f' + k, 32)."""
    frames = [list(md5_expand(f"{text}#f{k}", AVI_W * AVI_H))
              for k in range(AVI_FRAMES)]
    return encode_avi(frames, AVI_W, AVI_H)
