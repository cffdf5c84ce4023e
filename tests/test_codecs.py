"""Pure-function tests for the stdlib PNG/WAV codecs
(pgsink_spark/functions/codecs.py) — no Spark session needed.

The decoder's filter reconstruction is checked against an independent
naive per-byte implementation of the PNG spec written here in the
test, over hand-filtered scanlines — so an encoder bug can't mask a
matching decoder bug.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pgsink_spark.functions import codecs


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    px = _rng(channels).integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    data = codecs.encode_png(px)
    assert codecs.is_png(data)
    got = codecs.decode_png(data)
    assert got.shape == px.shape
    assert np.array_equal(got, px)


def test_png_gray_2d_input():
    px = _rng(9).integers(0, 256, size=(5, 8), dtype=np.uint8)
    got = codecs.decode_png(codecs.encode_png(px))
    assert np.array_equal(got[:, :, 0], px)


def _naive_unfilter(scanlines, w, h, channels):
    """Independent reference: PNG filter reconstruction, straight from
    the spec's per-byte recurrences."""
    stride = w * channels
    bpp = channels
    recon = [[0] * stride for _ in range(h)]
    for y, (ftype, line) in enumerate(scanlines):
        prior = recon[y - 1] if y else [0] * stride
        cur = recon[y]
        for i in range(stride):
            left = cur[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            x = line[i]
            if ftype == 0:
                r = x
            elif ftype == 1:
                r = x + left
            elif ftype == 2:
                r = x + up
            elif ftype == 3:
                r = x + ((left + up) >> 1)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                r = x + pred
            cur[i] = r & 0xFF
    return recon


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_all_five_filters_match_naive_reference(channels):
    """Craft a PNG whose scanlines cycle through every filter type and
    compare our decoder against the naive spec implementation."""
    w, h = 6, 10
    stride = w * channels
    rng = _rng(42 + channels)
    scanlines = [
        (y % 5, list(rng.integers(0, 256, size=stride)))
        for y in range(h)
    ]
    raw = b"".join(
        bytes([ftype]) + bytes(line) for ftype, line in scanlines
    )
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    data = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(raw))
        + codecs._chunk(b"IEND", b"")
    )
    got = codecs.decode_png(data)
    want = np.array(
        _naive_unfilter(scanlines, w, h, channels), dtype=np.uint8
    ).reshape(h, w, channels)
    assert np.array_equal(got, want)


def test_unsupported_pngs_raise():
    px = np.zeros((4, 4), dtype=np.uint8)
    good = codecs.encode_png(px)
    with pytest.raises(codecs.UnsupportedImage):
        codecs.decode_png(b"nonsense")
    # corrupt the bit depth to 16
    ihdr_at = good.index(b"IHDR")
    bad = bytearray(good)
    bad[ihdr_at + 4 + 8] = 16
    with pytest.raises(codecs.UnsupportedImage):
        codecs.decode_png(bytes(bad))


def test_resize_nearest_identity_and_downscale():
    px = _rng(3).integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    assert np.array_equal(codecs.resize_nearest(px, 8, 8), px)
    small = codecs.resize_nearest(px, 4, 4)
    assert small.shape == (4, 4, 3)
    # pixel-center mapping: out[0,0] samples src[1,1]
    assert np.array_equal(small[0, 0], px[1, 1])
    up = codecs.resize_nearest(px, 16, 16)
    assert up.shape == (16, 16, 3)
    assert np.array_equal(up[0, 0], px[0, 0])


def test_wav_roundtrip_mono_and_stereo():
    s = _rng(7).integers(-30000, 30000, size=200).astype(np.int16)
    got, rate = codecs.decode_wav(codecs.encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(got, s.astype(np.int32))
    st = _rng(8).integers(-30000, 30000, size=(100, 2)).astype(np.int16)
    got2, rate2 = codecs.decode_wav(codecs.encode_wav(st, 44100))
    assert rate2 == 44100 and got2.shape == (100, 2)
    assert np.array_equal(got2, st.astype(np.int32))


def test_wav_sniff():
    s = np.zeros(10, dtype=np.int16)
    data = codecs.encode_wav(s, 8000)
    assert codecs.is_wav(data)
    assert not codecs.is_wav(b"RIFFxxxxNOPE")
    assert not codecs.is_png(data)


def test_square_wave_rms_is_amp():
    """The closed form the multimodal oracle relies on: a ±amp square
    wave has RMS exactly amp, including over partial windows."""
    amp = 12345
    n = 1000
    s = np.where(np.arange(n) % 2 == 0, amp, -amp).astype(np.int16)
    flat, _ = codecs.decode_wav(codecs.encode_wav(s, 16000))
    f = flat.astype(np.float64)
    assert float(np.sqrt(np.mean(f * f))) == float(amp)
    part = f[:333]
    assert float(np.sqrt(np.mean(part * part))) == float(amp)


def test_png_roundtrip_property_random_images():
    """Property: encode→decode is the identity for arbitrary 8-bit
    images across shapes and channel counts (hypothesis drives the
    pixel content; zlib + all five scanline filters get exercised by
    the encoder's per-row filter choice)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from pgsink_spark.functions import codecs

    @settings(max_examples=40, deadline=None)
    @given(
        img=st.one_of(
            arrays(np.uint8, st.tuples(st.integers(1, 24), st.integers(1, 24))),
            arrays(
                np.uint8,
                st.tuples(
                    st.integers(1, 16), st.integers(1, 16), st.just(3)
                ),
            ),
        )
    )
    def roundtrip(img):
        out = codecs.decode_png(codecs.encode_png(img))
        if img.ndim == 2:
            out = out.reshape(img.shape)
        assert out.dtype == np.uint8
        assert (out == img).all()

    roundtrip()


def test_wav_roundtrip_property_random_pcm():
    """Property: arbitrary 16-bit PCM (mono) round-trips exactly."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from pgsink_spark.functions import codecs

    @settings(max_examples=40, deadline=None)
    @given(
        pcm=arrays(np.int16, st.integers(1, 4096)),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    def roundtrip(pcm, rate):
        s, r = codecs.decode_wav(codecs.encode_wav(pcm, rate))
        assert r == rate
        assert (s.reshape(-1) == pcm).all()

    roundtrip()
