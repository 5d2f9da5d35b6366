"""Real pure-numpy media codecs for the multimodal kernels.

This container ships no image/audio libraries, but three PUBLIC
container formats are simple enough to parse with ``struct`` + numpy
alone, which turns the multimodal decode path from a stub into a real
decoder:

* **BMP** (Windows bitmap, BITMAPINFOHEADER, 24-bit uncompressed) —
  images; encode, decode, nearest-neighbor resize.
* **PNG** (RFC 2083, 8-bit grey/RGB/RGBA, non-interlaced, all five
  scanline filters — stdlib zlib for DEFLATE) — the most common
  corpus image format; encode, decode, resize.
* **WAV** (RIFF PCM, 16-bit mono) — audio; encode, decode, features.
* **AVI** (RIFF, uncompressed DIB ``00db`` frames) — video; encode,
  decode, timestamped frame extraction.

All functions operate on in-memory ``bytes`` — the Spark side streams
payload columns through Arrow batches (see ``multimodal``); nothing
here touches the filesystem or a subprocess. At 100 TB these kernels
run inside ``mapInPandas`` workers where the payload bytes already
live, so decode adds zero shuffle.

Format references are the public specifications (MS-WMF/BMP file
format, RIFF/WAVE, OpenDML AVI); no third-party code.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP (24-bit, BITMAPINFOHEADER, bottom-up, BGR, 4-byte row padding)
# --------------------------------------------------------------------------

_BMP_HEADER_SIZE = 14
_BMP_INFO_SIZE = 40
_BMP_OFFSET = _BMP_HEADER_SIZE + _BMP_INFO_SIZE


def _bmp_row_size(width: int) -> int:
    return (width * 3 + 3) & ~3


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array -> 24-bit BMP bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {arr.shape}")
    h, w, _ = arr.shape
    row_size = _bmp_row_size(w)
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", _BMP_OFFSET + img_size, 0, 0, _BMP_OFFSET)
    info = struct.pack(
        "<IiiHHIIiiII", _BMP_INFO_SIZE, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = arr[:, :, ::-1]
    pad = b"\x00" * (row_size - w * 3)
    body = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    return header + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BMP bytes -> (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = struct.unpack_from("<I", payload, 10)[0]
    _, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = _bmp_row_size(w)
    rows = np.frombuffer(payload, np.uint8, row_size * h, offset).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray) -> list[float]:
    """[height, width, mean_r, mean_g, mean_b, luma_std] feature vector."""
    h, w, _ = arr.shape
    means = arr.reshape(-1, 3).mean(axis=0)
    luma = arr @ np.array([0.299, 0.587, 0.114])
    return [float(h), float(w), *[float(m) for m in means], float(luma.std())]


# --------------------------------------------------------------------------
# PNG (RFC 2083: 8-bit greyscale/RGB/RGBA, non-interlaced, zlib + the
# five scanline filters). stdlib zlib handles DEFLATE; numpy handles
# unfiltering — Sub is a per-lane cumsum, Up is vectorized, Average and
# Paeth walk pixels with bpp-lane vector steps.
# --------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, *, filter_type: int = 0) -> bytes:
    """(h, w[, 3|4]) uint8 array -> PNG bytes (8-bit, non-interlaced).

    ``filter_type`` applies one scanline filter to every row (0=None
    default; 1..4 exist so the decoder's unfilter paths are testable
    and for better compression on smooth images)."""
    import zlib

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"expected 1, 3 or 4 channels, got {ch}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter type: {filter_type}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = arr.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        cur = rows[y]
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        up_left = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        else:
            p = left + prev - up_left
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - up_left)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, up_left))
            filt = cur - pred
        out.append(filter_type)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB array.

    Supports 8-bit greyscale (0), RGB (2) and RGBA (6), non-interlaced,
    all five scanline filters. Greyscale broadcasts to RGB and RGBA
    drops alpha so every image feeds the same feature/resize kernels."""
    import zlib

    if payload[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG payload (bad magic)")
    pos, w = len(_PNG_MAGIC), None
    idat = bytearray()
    while pos + 8 <= len(payload):
        size, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        pos += 12 + size  # len + type + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in _PNG_CHANNELS:
                raise ValueError(
                    f"only 8-bit grey/RGB/RGBA PNG supported (depth={depth}, color={color})"
                )
            if interlace or comp or filt:
                raise ValueError("interlaced/nonzero-method PNG not supported")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    ch = _PNG_CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * ch + 1
    if raw.size != stride * h:
        raise ValueError("PNG scanline data size mismatch")
    lines = raw.reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.int16)
    zero_px = np.zeros(ch, np.int16)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int16)
        prev = out[y - 1] if y else np.zeros(w * ch, np.int16)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp] -> lane cumsum
            out[y] = np.cumsum(cur.reshape(w, ch), axis=0, dtype=np.int64).reshape(-1) & 0xFF
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential along the row
            cur2 = cur.reshape(w, ch)
            prev2 = prev.reshape(w, ch)
            rec = np.zeros((w, ch), dtype=np.int16)
            left = zero_px
            for x in range(w):
                up = prev2[x]
                up_left = prev2[x - 1] if x else zero_px
                if f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - up_left
                    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, up_left)
                    )
                left = (cur2[x] + pred) & 0xFF
                rec[x] = left
            out[y] = rec.reshape(-1)
        else:
            raise ValueError(f"unknown PNG filter byte: {f}")
    img = out.astype(np.uint8).reshape(h, w, ch)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3].copy()


# --------------------------------------------------------------------------
# WAV (RIFF, PCM, 16-bit mono)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 sample array -> RIFF/WAVE PCM bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes -> (sample_rate, int16 sample array)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    rate, bits, channels, data = None, None, None, None
    for fourcc, start, size in _riff_chunks(payload, 12, len(payload)):
        if fourcc == b"fmt ":
            _fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, start
            )
        elif fourcc == b"data":
            data = payload[start : start + size]
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunks")
    if bits != 16 or channels != 1:
        raise ValueError(f"only 16-bit mono PCM supported (bits={bits}, ch={channels})")
    return rate, np.frombuffer(data, dtype="<i2")


def audio_features(rate: int, samples: np.ndarray) -> list[float]:
    """[duration_ms, rms, zero_crossing_rate, dominant_freq_hz]."""
    x = samples.astype(np.float64)
    n = len(x)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    duration_ms = 1000.0 * n / rate
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    spectrum = np.abs(np.fft.rfft(x))
    spectrum[0] = 0.0  # ignore DC
    dom = float(np.argmax(spectrum) * rate / n) if n > 1 else 0.0
    return [duration_ms, rms, zcr, dom]


# --------------------------------------------------------------------------
# AVI (RIFF, single video stream, uncompressed 24-bit DIB '00db' frames)
# --------------------------------------------------------------------------


def _list_chunk(list_type: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(body)) + list_type + body


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> minimal uncompressed AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    row_size = _bmp_row_size(w)
    frame_size = row_size * h
    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, frame_size * fps, 0, 0x10, len(frames), 0, 1, frame_size,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames), frame_size, 0xFFFFFFFF,
        0, 0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHHIIiiII", _BMP_INFO_SIZE, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = _list_chunk(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list_chunk(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(
        _chunk(
            b"00db",
            b"".join(
                np.asarray(f, np.uint8)[:, :, ::-1][y].tobytes()
                + b"\x00" * (row_size - w * 3)
                for y in range(h - 1, -1, -1)
            ),
        )
        for f in frames
    )
    movi = _list_chunk(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """Minimal AVI bytes -> (fps, [(h, w, 3) uint8 RGB frames])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    fps, w, h = None, None, None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps, w, h
        for fourcc, start, size in _riff_chunks(payload, pos, end):
            if fourcc == b"LIST":
                walk(start + 4, start + size)
            elif fourcc == b"strh":
                scale, rate = struct.unpack_from("<II", payload, start + 20)
                if scale:
                    fps = rate // scale
            elif fourcc == b"strf":
                _, w, h = struct.unpack_from("<Iii", payload, start)
            elif fourcc == b"00db" and w is not None:
                row_size = _bmp_row_size(w)
                rows = np.frombuffer(payload, np.uint8, row_size * h, start).reshape(
                    h, row_size
                )
                frames.append(rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy())

    walk(12, len(payload))
    if fps is None or not frames:
        raise ValueError("AVI missing stream header or frames")
    return fps, frames


def frame_at(payload: bytes, ts_ms: int) -> np.ndarray:
    """Decode the AVI frame covering timestamp ``ts_ms``."""
    fps, frames = decode_avi(payload)
    idx = min(int(ts_ms * fps // 1000), len(frames) - 1)
    return frames[max(idx, 0)]


# --------------------------------------------------------------------------
# sniffing dispatcher — the default kernels installed by multimodal
# --------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str | None:
    """'bmp' | 'png' | 'wav' | 'avi' | None from the payload magic."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return None


def decode_features(payload: bytes, media_type: str) -> list[float]:
    """Real decode + featurize for any sniffable payload.

    Images -> image_features of the bitmap; audio -> audio_features of
    the PCM stream; video -> image_features of the first frame plus
    [n_frames, fps]. Unknown formats raise ValueError (callers fall
    back to the stub when configured to)."""
    kind = sniff_format(payload)
    if kind == "bmp":
        return image_features(decode_bmp(payload)) + [0.0, 0.0]
    if kind == "png":
        return image_features(decode_png(payload)) + [0.0, 0.0]
    if kind == "wav":
        rate, samples = decode_wav(payload)
        return audio_features(rate, samples) + [0.0, 0.0, 0.0, 0.0]
    if kind == "avi":
        fps, frames = decode_avi(payload)
        return image_features(frames[0]) + [float(len(frames)), float(fps)]
    raise ValueError(f"unknown media payload for {media_type!r}")


def resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Real resize: BMP -> resized BMP; AVI -> AVI with resized frames."""
    kind = sniff_format(payload)
    if kind == "bmp":
        return encode_bmp(resize_nearest(decode_bmp(payload), width, height))
    if kind == "png":
        return encode_png(resize_nearest(decode_png(payload), width, height))
    if kind == "avi":
        fps, frames = decode_avi(payload)
        return encode_avi([resize_nearest(f, width, height) for f in frames], fps=fps)
    raise ValueError("resize supports BMP, PNG and AVI payloads")


def sample_frame(payload: bytes, ts_ms: int) -> bytes:
    """Real frame sampling: the AVI frame at ts_ms re-encoded as BMP."""
    if sniff_format(payload) != "avi":
        raise ValueError("frame sampling supports AVI payloads")
    return encode_bmp(frame_at(payload, ts_ms))
