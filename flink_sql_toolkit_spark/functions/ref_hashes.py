"""Independent pure-Python reference implementations of the hash /
phonetic functions DuckDB lacks (sha1, crc32, murmur3, xxh64,
soundex — reference vocabulary at syntaxes/flink.tmLanguage.json:
460-466).

Purpose: the ``func_hash_extra`` oracle. DuckDB 1.0 has none of
these builtins, so the oracle embeds expected values as literals —
computed HERE, from-spec, sharing zero code with the JVM
implementations Spark executes. ``tests/test_operators.py`` pins
these implementations against Spark's over a generated corpus
(lengths 0-40 crossing every tail-handling branch), so the literal
generation is itself differentially verified.

All functions take ``bytes``/``str`` and return the value in
Spark's output convention (signed int32 for murmur3, signed int64
for xxh64, unsigned bigint for crc32).
"""

from __future__ import annotations

import hashlib
import zlib

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def sha1_hex(data: bytes) -> str:
    return hashlib.sha1(data).hexdigest()


def crc32_long(data: bytes) -> int:
    """Spark's crc32() — unsigned CRC-32 as BIGINT."""
    return zlib.crc32(data) & _M32


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Murmur3 x86_32 in Spark's variant (``hash()``, seed 42).

    Spark's tail handling intentionally diverges from canonical
    murmur3: each remaining byte past the last aligned 4-byte word
    is sign-extended and mixed as a FULL k1/h1 round (Spark
    Murmur3_x86_32.hashUnsafeBytes), instead of being accumulated
    into a single trailing k1. Output is the signed Java int.
    """
    h1 = seed & _M32

    def mix_k1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & _M32
        k1 = _rotl32(k1, 15)
        return (k1 * 0x1B873593) & _M32

    def mix_h1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        return (h1 * 5 + 0xE6546B64) & _M32

    n_aligned = len(data) - len(data) % 4
    for i in range(0, n_aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = mix_h1(h1, mix_k1(word))
    for i in range(n_aligned, len(data)):
        byte = data[i] - 256 if data[i] >= 128 else data[i]  # signed
        h1 = mix_h1(h1, mix_k1(byte & _M32))
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= 1 << 31 else h1


_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Canonical XXH64 (Spark's ``xxhash64()``, seed 42), signed
    Java long output."""
    length = len(data)
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        i = 0
        while i <= length - 32:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                lane = int.from_bytes(data[i + off : i + off + 8], "little")
                acc = (v1, v2, v3, v4)[v - 1]
                acc = (_rotl64((acc + lane * _P2) & _M64, 31) * _P1) & _M64
                if v == 1:
                    v1 = acc
                elif v == 2:
                    v2 = acc
                elif v == 3:
                    v3 = acc
                else:
                    v4 = acc
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + length) & _M64
    while i <= length - 8:
        lane = int.from_bytes(data[i : i + 8], "little")
        k1 = (_rotl64((lane * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl64(h ^ k1, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= length - 4:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl64(h ^ ((lane * _P1) & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < length:
        h = (_rotl64(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= 1 << 63 else h


# A=0 E=0 I=0 O=0 U=0 Y=0 reset the previous code; H=7 W=7 are
# transparent (skipped without reset) — Spark/Oracle semantics,
# giving the classic Ashcraft -> A261.
_SOUNDEX_CODE = "01230127022455012623017202"


def soundex(s: str) -> str:
    """Spark's SOUNDEX (Oracle-compatible American Soundex)."""
    if not s or not s[0].isalpha() or ord(s[0].upper()) > ord("Z"):
        return s
    up = s.upper()
    out = [up[0]]
    last = _SOUNDEX_CODE[ord(up[0]) - ord("A")]
    for ch in up[1:]:
        if not ("A" <= ch <= "Z"):
            continue
        code = _SOUNDEX_CODE[ord(ch) - ord("A")]
        if code == "7":
            continue
        if code != "0" and code != last:
            out.append(code)
            if len(out) == 4:
                break
        last = code
    while len(out) < 4:
        out.append("0")
    return "".join(out)
