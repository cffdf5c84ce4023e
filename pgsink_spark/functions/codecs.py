"""Real media codecs on the Python stdlib: PNG and WAV.

The container has no PIL/ffmpeg/librosa, but PNG and WAV are open
specs implementable on ``zlib``/``struct``/``wave`` alone — so the
multimodal operators' codec boundary can do REAL work (inflate IDAT
streams, reconstruct scanline filters, parse PCM frames) instead of
digest arithmetic. The deterministic digest stub remains the fallback
for payloads that are neither (see operators/multimodal.py).

Supported PNG subset (decode): 8-bit, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA); all five scanline filters (None / Sub / Up /
Average / Paeth); non-interlaced. Palette, 16-bit, and Adam7 raise
``UnsupportedImage`` — callers fall back to the stub. Encode emits
filter-0 scanlines (decoders must accept any filter; encoders may
choose). WAV: integer PCM (8/16/32-bit) via the stdlib ``wave``
module.

Everything here is pure functions over ``bytes`` — no Spark imports —
so the same code runs inside Arrow-batched ``mapInPandas`` stages and
in plain pytest.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedImage(ValueError):
    """PNG feature outside the supported subset (palette/16-bit/Adam7)."""


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIG


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# ---------------------------------------------------------------------------
# PNG


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (H,W) gray or (H,W,C) with C in {1,2,3,4} → PNG."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, w: int, h: int, channels: int) -> np.ndarray:
    """Reconstruct scanlines per the five PNG filter types."""
    stride = w * channels
    bpp = channels
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prior = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.uint16
        )
        pos += stride
        if ftype == 0:
            recon = line
        elif ftype == 1:  # Sub
            recon = line.copy()
            for i in range(bpp, stride):
                recon[i] = (recon[i] + recon[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            recon = (line + prior) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                recon[i] = (recon[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for i in range(stride):
                left = int(recon[i - bpp]) if i >= bpp else 0
                up = int(prior[i])
                ul = int(prior[i - bpp]) if i >= bpp else 0
                recon[i] = (recon[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise UnsupportedImage(f"bad filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return out.reshape(h, w, channels)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H, W, C). Real inflate + unfilter."""
    if not is_png(data):
        raise UnsupportedImage("not a PNG signature")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color not in _CHANNELS or interlace:
                raise UnsupportedImage(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace})"
                )
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(payload)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise UnsupportedImage("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * channels)
    if len(raw) != expect:
        raise UnsupportedImage(f"IDAT size {len(raw)} != {expect}")
    return _unfilter(raw, width, height, channels)


def resize_nearest(px: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resample (H,W,C) → (h,w,C) — pixel-center grid."""
    src_h, src_w = px.shape[:2]
    ys = np.minimum(((np.arange(h) + 0.5) * src_h / h).astype(int), src_h - 1)
    xs = np.minimum(((np.arange(w) + 0.5) * src_w / w).astype(int), src_w - 1)
    return px[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono/stereo array (N,) or (N, ch) → WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    ch = 1 if s.ndim == 1 else s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples int32 array (N,) or (N, ch), sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        ch, sampwidth, rate, nframes = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        frames = w.readframes(nframes)
    if sampwidth == 1:  # unsigned 8-bit per spec
        s = np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
    elif sampwidth == 2:
        s = np.frombuffer(frames, dtype="<i2").astype(np.int32)
    elif sampwidth == 4:
        s = np.frombuffer(frames, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    if ch > 1:
        s = s.reshape(-1, ch)
    return s, rate
