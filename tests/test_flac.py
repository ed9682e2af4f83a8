"""FLAC codec conformance: round-trips, feature coverage, corruption.

No libFLAC exists in this container (unlike giflib), so conformance
rests on exhaustive round-trips over every subframe type / stereo mode /
residual shape, plus integrity-check tests proving the CRC-8 / CRC-16 /
STREAMINFO-MD5 verifications actually fire.  The gate parity
(media_features_flac vs the closed-form oracle) certifies the decode
chain against an independent formulation of the same samples.
"""

from __future__ import annotations

import random

import pytest

from nlp_lib_spark.operators.flac import (_utf8_code, crc8, crc16,
                                          decode_flac, encode_flac)


def _rt(channels, **kw):
    data = encode_flac([list(c) for c in channels], **kw)
    rate, bps, out = decode_flac(data)
    assert out == [list(c) for c in channels]
    return data, rate, bps


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_roundtrip_random_mono(seed):
    rng = random.Random(seed)
    n = rng.choice([1, 7, 100, 1000, 5000])
    mono = [rng.randint(-32768, 32767) for _ in range(n)]
    data, rate, bps = _rt([mono])
    assert (rate, bps) == (8000, 16)


def test_roundtrip_multi_frame_and_block_sizes():
    rng = random.Random(4)
    mono = [rng.randint(-32768, 32767) for _ in range(700)]
    for bs in (192, 100, 256, 576):
        _rt([mono], block_size=bs)


@pytest.mark.parametrize("force", [
    ("verbatim",), ("fixed", 0), ("fixed", 1), ("fixed", 2),
    ("fixed", 3), ("fixed", 4),
    ("lpc", [3, -2], 1, 5), ("lpc", [1, 2, -1, 3, -2, 1, 1, -1], 4, 6),
])
def test_roundtrip_forced_subframes(force):
    rng = random.Random(5)
    mono = [rng.randint(-32768, 32767) for _ in range(200)]
    _rt([mono], force=force)


def test_roundtrip_constant_and_auto_compress():
    data, _, _ = _rt([[5] * 3000])
    assert len(data) < 200  # constant subframes actually compress
    ramp = list(range(-500, 2500))
    data2, _, _ = _rt([ramp])
    assert len(data2) < len(ramp) * 2 // 4  # fixed order-2 compresses


def test_roundtrip_partitions_and_escape():
    rng = random.Random(6)
    mono = [rng.randint(-32768, 32767) for _ in range(512)]
    _rt([mono], block_size=256, partition_order=2)
    _rt([mono[:64]], force_escape=True)
    _rt([mono[:64]], block_size=32, partition_order=1, force_escape=True)


def test_roundtrip_wasted_bits():
    rng = random.Random(7)
    mono = [rng.randint(-4000, 4000) * 8 for _ in range(300)]
    data, _, _ = _rt([mono])
    plain, _, _ = _rt([[x // 8 for x in mono]])
    # the wasted-bits header makes the shifted stream cost ~the same as
    # the unshifted one, far below 16-bit verbatim
    assert len(data) < len(plain) + 64


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_roundtrip_stereo_modes(mode):
    rng = random.Random(8)
    st = [[rng.randint(-30000, 30000) for _ in range(301)]
          for _ in range(2)]
    _rt(st, stereo_mode=mode, block_size=128)
    # odd/even parity stress for the mid/side reconstruction
    st2 = [[1, -1, 3, -3, 32767, -32768, 0, 1],
           [0, 1, -1, 2, -32768, 32767, 1, 0]]
    _rt(st2, stereo_mode=mode)


def test_corruption_detected_everywhere():
    rng = random.Random(9)
    mono = [rng.randint(-32768, 32767) for _ in range(64)]
    data = bytearray(encode_flac(mono))
    # frame body flip -> CRC-16; header flip -> CRC-8 or sync; STREAMINFO
    # md5 flip -> MD5 check. Every single-bit flip after the marker must
    # surface as SOME ValueError, never silent wrong samples.
    undetected = []
    for i in range(4, len(data)):
        bad = bytearray(data)
        bad[i] ^= 0x10
        try:
            _, _, out = decode_flac(bytes(bad))
            if out != [mono]:
                undetected.append(i)
        except ValueError:
            pass
    assert undetected == []


def test_utf8_frame_numbers_roundtrip_long_streams():
    # >128 frames forces multi-byte UTF-8 frame numbers
    mono = [((i * 37) % 251) - 125 for i in range(129 * 4)]
    _rt([mono], block_size=4)
    for n, want in ((0, b"\x00"), (127, b"\x7f"),
                    (128, b"\xc2\x80"), (0x7FF, b"\xdf\xbf"),
                    (0x800, b"\xe0\xa0\x80")):
        assert _utf8_code(n) == want


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 against classic check data
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_bad_streams_raise():
    with pytest.raises(ValueError):
        decode_flac(b"NOPE")
    with pytest.raises(ValueError):
        encode_flac([])
    with pytest.raises(ValueError):
        encode_flac([[1, 2], [3]])  # channel length mismatch
    with pytest.raises(ValueError):
        encode_flac([[1]] * 3)  # 3 channels unsupported
