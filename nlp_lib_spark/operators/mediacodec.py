"""Pure-stdlib/numpy media codecs for the ``mode="real"`` decode path.

The container has no PIL/librosa/pyav (verified at round-3 start, recorded
in BASELINE.md), but two real, widely-used container formats ARE decodable
with what IS baked in: uncompressed 24-bit BMP (plain struct parsing +
numpy) and PCM16 WAV (stdlib ``wave``). This module provides symmetric
encoders/decoders so the ``extract_media_features(mode="real")`` seam
(operators/multimodal.py) performs a genuine decode — magic-byte dispatch,
header parsing, row-padding/bottom-up handling, sample extraction — rather
than a stub. Video stays honestly stubbed: no container demuxer exists in
the stdlib.

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


# --------------------------------------------------------------- BMP (24bpp)

def encode_bmp(gray: list[int], width: int, height: int) -> bytes:
    """Write an uncompressed 24-bit BMP (gray pixels r=g=b, standard
    bottom-up row order, rows padded to 4-byte boundaries). ``gray`` is
    raster order: row 0 = TOP row."""
    if len(gray) != width * height:
        raise ValueError("pixel count != width*height")
    row_stride = (width * 3 + 3) // 4 * 4
    data_size = row_stride * height
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       data_size, 2835, 2835, 0, 0)
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for c in range(width):
            v = gray[r * width + c]
            row += bytes((v, v, v))  # BGR
        row += b"\x00" * (row_stride - len(row))
        body += row
    return hdr + info + bytes(body)


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
    row_stride = (width * 3 + 3) // 4 * 4
    gray: list[int] = [0] * (width * height)
    for i in range(height):
        src_row = i if top_down else height - 1 - i
        base = off + src_row * row_stride
        for c in range(width):
            b, g, r = data[base + 3 * c:base + 3 * c + 3]
            gray[i * width + c] = (r + g + b) // 3
    return width, height, gray


def image_features(data: bytes) -> list[float]:
    w, h, gray = decode_bmp(data)
    resized = [gray[(i * h // RESIZE_N) * w + (j * w // RESIZE_N)]
               for i in range(RESIZE_N) for j in range(RESIZE_N)]
    return [float(x) for x in
            (w, h, min(gray), max(gray), sum(gray), *resized)]


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
    if data[:2] == b"BM":
        return image_features(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return audio_features(data)
    raise ValueError("unsupported media container (BMP and PCM16 WAV are "
                     "the decoders available without optional codec deps)")


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
