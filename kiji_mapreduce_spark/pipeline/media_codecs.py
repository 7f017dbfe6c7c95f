"""Real media codecs with zero external dependencies.

The environment ships no PIL/libvips/ffmpeg, but two formats are fully
decodable from the Python standard library, so the engine's "real
decode" path (``multimodal._decode_image_real``) stops being a stub for
them:

- **PNG** (public spec, RFC 2083): chunk parse, zlib-inflate the IDAT
  stream, reverse the five scanline filters. Supports 8-bit grayscale /
  gray+alpha / RGB / RGBA, non-interlaced — the shapes ML pipelines
  actually emit. Palette, 16-bit, and interlaced images raise
  ``UnsupportedMedia`` (use PIL in production for those).
- **WAV** via the stdlib ``wave`` module: PCM frames + rate/channels.

Encoding (``encode_png``) writes filter-0 scanlines — enough to
round-trip tests and to emit real resized images.

NumPy does the pixel math (unfiltering is O(pixels); the per-scanline
loop is in Python but each scanline op is vectorized), which is the
right shape for mapInPandas batches: decode runs executor-side on
Arrow-delivered bytes, never on the driver.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


class UnsupportedMedia(ValueError):
    """Decodable format family, unsupported variant (palette PNG, ...)."""


def decode_png(content: bytes) -> tuple[np.ndarray, int, int, int]:
    """PNG bytes -> (pixels uint8 [h, w, channels], width, height,
    channels)."""
    if content[:8] != _PNG_MAGIC:
        raise UnsupportedMedia("not a PNG (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos < len(content):
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise UnsupportedMedia("PNG missing IHDR")
    if bit_depth != 8:
        raise UnsupportedMedia(f"unsupported PNG bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise UnsupportedMedia(
            f"unsupported PNG color type {color_type} (palette?)")
    if interlace:
        raise UnsupportedMedia("interlaced PNG unsupported")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise UnsupportedMedia("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub: add left neighbor (sequential in-row)
            line = _unfilter_sub(line, channels)
        elif ftype == 2:  # Up
            line += prev
        elif ftype == 3:  # Average
            line = _unfilter_avg(line, prev, channels)
        elif ftype == 4:  # Paeth
            line = _unfilter_paeth(line, prev, channels)
        else:
            raise UnsupportedMedia(f"unknown PNG filter {ftype}")
        out[y] = line
        prev = line
    return out.reshape(height, width, channels), width, height, channels


def _unfilter_sub(line: np.ndarray, bpp: int) -> np.ndarray:
    for i in range(bpp, len(line)):
        line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
    return line


def _unfilter_avg(line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    for i in range(len(line)):
        left = int(line[i - bpp]) if i >= bpp else 0
        line[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
    return line


def _unfilter_paeth(line: np.ndarray, prev: np.ndarray,
                    bpp: int) -> np.ndarray:
    for i in range(len(line)):
        left = int(line[i - bpp]) if i >= bpp else 0
        up = int(prev[i])
        ul = int(prev[i - bpp]) if i >= bpp else 0
        p = left + up - ul
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
        if pa <= pb and pa <= pc:
            pred = left
        elif pb <= pc:
            pred = up
        else:
            pred = ul
        line[i] = (int(line[i]) + pred) & 0xFF
    return line


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array [h, w] or [h, w, channels] -> PNG bytes (filter 0)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    height, width, channels = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise UnsupportedMedia(f"cannot encode {channels}-channel PNG")
    body = pixels.astype(np.uint8).reshape(height, width * channels)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(height))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic, dependency-free
    resampler; swap for PIL's Lanczos in production)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


_MPNG_MAGIC = b"MPNG"


def encode_video(frames: list[np.ndarray],
                 micros_per_frame: int = 40000) -> bytes:
    """Motion-PNG container: each frame a real PNG (lossless), so the
    whole stack stays stdlib-decodable. Layout: ``b"MPNG"`` | u8
    version=1 | u16be frame count | u32be micros-per-frame | per frame
    u32be length + PNG bytes. This is the engine's NATIVE interchange
    container for tests and synthetic pipelines; real-world MP4/WebM
    decode is ffmpeg territory (``multimodal`` raises
    ``DecoderNotAvailable`` for them, same discipline as non-WAV
    audio)."""
    if len(frames) > 0xFFFF:
        raise UnsupportedMedia(f"too many frames ({len(frames)} > 65535)")
    if not 0 <= micros_per_frame <= 0xFFFFFFFF:
        raise UnsupportedMedia(
            f"micros_per_frame {micros_per_frame} outside u32 range")
    parts = [_MPNG_MAGIC, struct.pack(">BHI", 1, len(frames),
                                      micros_per_frame)]
    for fr in frames:
        png = encode_png(fr)
        parts.append(struct.pack(">I", len(png)))
        parts.append(png)
    return b"".join(parts)


def decode_video(content: bytes) -> tuple[list[np.ndarray], int]:
    """Motion-PNG bytes -> (frames as uint8 [h, w, channels] arrays,
    micros_per_frame). Raises ``UnsupportedMedia`` on anything else."""
    if content[:4] != _MPNG_MAGIC:
        raise UnsupportedMedia("not a Motion-PNG container (bad magic)")
    if len(content) < 11:
        raise UnsupportedMedia("Motion-PNG truncated (container header)")
    version, n_frames, micros = struct.unpack(">BHI", content[4:11])
    if version != 1:
        raise UnsupportedMedia(f"unsupported Motion-PNG version {version}")
    frames: list[np.ndarray] = []
    pos = 11
    for _ in range(n_frames):
        if pos + 4 > len(content):
            raise UnsupportedMedia("Motion-PNG truncated (frame header)")
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        pos += 4
        blob = content[pos:pos + length]
        if len(blob) != length:
            raise UnsupportedMedia("Motion-PNG truncated (frame body)")
        pos += length
        pixels, _w, _h, _c = decode_png(blob)
        frames.append(pixels)
    return frames, micros


def decode_wav(content: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (samples int16/uint8 [n_frames, n_channels],
    sample_rate, sample_width_bytes)."""
    with wave.open(io.BytesIO(content), "rb") as w:
        n_channels = w.getnchannels()
        rate = w.getframerate()
        sampwidth = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if sampwidth == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif sampwidth == 1:
        arr = np.frombuffer(frames, dtype=np.uint8)
    else:
        raise UnsupportedMedia(f"unsupported WAV sample width {sampwidth}")
    return arr.reshape(-1, n_channels), rate, sampwidth


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 [n_frames, n_channels] -> WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()
