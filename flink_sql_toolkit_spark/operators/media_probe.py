"""Pure-Python media header probing — real decode of container
metadata without imaging/audio libraries.

The multimodal pipeline (SURVEY §6 north star: binary columns +
typed metadata) needs width/height/sample-rate/duration features.
Full pixel/sample decode requires codec libraries this environment
doesn't ship — but every mainstream container declares its geometry
in a fixed header, parseable from-spec with stdlib ``struct``:

- PNG:  IHDR chunk — width/height as big-endian u32 (RFC 2083 §3.1)
- JPEG: SOF0/1/2/... marker segment — height/width u16 (ITU T.81 B.2.2)
- GIF:  logical screen descriptor — width/height little-endian u16
- BMP:  BITMAPINFOHEADER — width/height little-endian i32
- WAV:  RIFF 'fmt ' chunk — channels/sample-rate; 'data' size → duration
- MP4:  ISO-BMFF 'moov/mvhd' box — timescale + duration

These are REAL parsers (exercised against bit-valid synthesized
payloads in tests), not stubs; only pixel-level operations (resize,
frame extraction) remain gated on external libraries.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass
class MediaInfo:
    """Typed header metadata; unknown fields stay None."""

    format: str  # 'png' | 'jpeg' | 'gif' | 'bmp' | 'wav' | 'mp4' | 'unknown'
    kind: str  # 'image' | 'audio' | 'video' | 'unknown'
    width: int | None = None
    height: int | None = None
    channels: int | None = None
    sample_rate: int | None = None
    duration_ms: int | None = None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers carrying frame geometry (T.81 B.2.2); C4/C8/CC are
# DHT/JPG/DAC, not frames
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def _probe_png(p: bytes) -> MediaInfo | None:
    # signature + IHDR must be the first chunk: len(4) type(4) data
    if len(p) < 24 or not p.startswith(_PNG_SIG) or p[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", p[16:24])
    return MediaInfo("png", "image", width=width, height=height)


def _probe_jpeg(p: bytes) -> MediaInfo | None:
    if len(p) < 4 or p[0:2] != b"\xff\xd8":  # SOI
        return None
    i = 2
    while i + 4 <= len(p):
        if p[i] != 0xFF:
            return None  # marker desync — corrupt stream
        marker = p[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers have no length
            continue
        if i + 4 > len(p):
            return None
        seg_len = struct.unpack(">H", p[i + 2 : i + 4])[0]
        if marker in _JPEG_SOF:
            if i + 9 > len(p):
                return None
            height, width = struct.unpack(">HH", p[i + 5 : i + 9])
            return MediaInfo("jpeg", "image", width=width, height=height)
        if marker == 0xDA:  # SOS — entropy data follows; no SOF seen
            return None
        i += 2 + seg_len
    return None


def _probe_gif(p: bytes) -> MediaInfo | None:
    if len(p) < 10 or p[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack("<HH", p[6:10])
    return MediaInfo("gif", "image", width=width, height=height)


def _probe_bmp(p: bytes) -> MediaInfo | None:
    # 'BM' alone is just ASCII — validate the fixed header fields so a
    # text payload starting with "BM" isn't misread as a bitmap: the
    # 4 reserved bytes must be zero, the DIB header size must be one
    # of the published BITMAPINFOHEADER family sizes, and planes == 1.
    if len(p) < 30 or p[:2] != b"BM":
        return None
    if p[6:10] != b"\x00\x00\x00\x00":
        return None
    dib_size = struct.unpack("<I", p[14:18])[0]
    if dib_size not in (40, 52, 56, 64, 108, 124):
        return None
    width, height = struct.unpack("<ii", p[18:26])
    planes = struct.unpack("<H", p[26:28])[0]
    if planes != 1 or width <= 0 or height == 0:
        return None
    return MediaInfo("bmp", "image", width=width, height=abs(height))


def _probe_wav(p: bytes) -> MediaInfo | None:
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    channels = sample_rate = None
    byte_rate = data_size = None
    i = 12
    while i + 8 <= len(p):
        chunk_id = p[i : i + 4]
        chunk_len = struct.unpack("<I", p[i + 4 : i + 8])[0]
        if chunk_id == b"fmt " and i + 24 <= len(p):
            channels, sample_rate, byte_rate = struct.unpack(
                "<HII", p[i + 10 : i + 20]
            )
        elif chunk_id == b"data":
            data_size = chunk_len
        i += 8 + chunk_len + (chunk_len & 1)  # chunks are word-aligned
    duration = (
        int(data_size * 1000 / byte_rate)
        if byte_rate and data_size is not None
        else None
    )
    return MediaInfo(
        "wav", "audio", channels=channels, sample_rate=sample_rate,
        duration_ms=duration,
    )


def _probe_mp4(p: bytes) -> MediaInfo | None:
    # ISO-BMFF: size(4) type(4) boxes; geometry lives in moov/mvhd
    if len(p) < 12 or p[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int, depth: int = 0) -> MediaInfo | None:
        if depth > 32:
            # real containers nest moov a level or two deep; a crafted
            # chain of nested moov headers would otherwise recurse one
            # frame per level (r11) — degrade to the bare container id
            return None
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", p[i : i + 4])[0]
            btype = p[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                # 64-bit largesize header (ISO 14496-12 §4.2 — any box
                # over 4 GiB, commonly mdat before moov)
                if i + 16 > hi:
                    return None
                size = struct.unpack(">Q", p[i + 8 : i + 16])[0]
                hdr = 16
            elif size == 0:
                # box extends to the end of the enclosing container
                size = hi - i
            if size < hdr:
                return None
            if btype == b"moov":
                inner = walk(i + hdr, min(i + size, hi), depth + 1)
                if inner:
                    return inner
            elif btype == b"mvhd" and i + hdr + 24 <= hi:
                base = i + hdr
                version = p[base]
                if version == 1:
                    # v1 layout needs 32 bytes past the header; the loop
                    # guard above only guarantees 24 (the v0 layout) — a
                    # truncated v1 box must degrade, not struct.error.
                    if base + 32 > hi:
                        return MediaInfo("mp4", "video")
                    timescale = struct.unpack(">I", p[base + 20 : base + 24])[0]
                    duration = struct.unpack(">Q", p[base + 24 : base + 32])[0]
                else:
                    timescale = struct.unpack(">I", p[base + 12 : base + 16])[0]
                    duration = struct.unpack(">I", p[base + 16 : base + 20])[0]
                ms = int(duration * 1000 / timescale) if timescale else None
                return MediaInfo("mp4", "video", duration_ms=ms)
            i += size
        return None

    found = walk(0, len(p))
    return found or MediaInfo("mp4", "video")


_PROBES = (_probe_png, _probe_gif, _probe_bmp, _probe_wav, _probe_mp4, _probe_jpeg)


def probe_media(payload: bytes) -> MediaInfo:
    """Identify the container and parse its header metadata; returns
    ``MediaInfo('unknown', 'unknown')`` for unrecognized bytes."""
    for probe in _PROBES:
        try:
            info = probe(payload)
        except (struct.error, IndexError, ValueError, RecursionError):
            # A malformed header must degrade to 'unknown', never crash
            # the mapInPandas job (the documented contract).
            # RecursionError: a crafted chain of nested moov boxes
            # drives _probe_mp4's walk() one frame per level (r11).
            continue
        if info is not None:
            return info
    return MediaInfo("unknown", "unknown")
