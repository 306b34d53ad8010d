"""Pure stdlib+numpy RIFF/WAVE codec: baseline PCM (8/16/24/32-bit) + IEEE
float32, encode and decode.

Container discipline mirrors the TIFF reader (aira's byte-level IFD walk,
/root/reference/crates/aira-tiff/src/decoder/mod.rs: header magic check,
bounded chunk iteration, explicit truncation checks): the RIFF header is
validated against the physical buffer, chunks are walked with the spec's
odd-size pad byte, unknown chunks (LIST/INFO/fact/cue...) are skipped by
size, and every malformed or unsupported input raises a typed `WavError`
naming the offending field — the same loud unsupported-codec error contract
as the reference's compression dispatch
(/root/reference/crates/aira-tiff/src/compression.rs:100-104): compressed
WAVE format codes (ADPCM, a-law, mu-law, MP3...) are refused by NAME, never
silently misdecoded.

Decode convention (documented, test-pinned): PCM samples come back as int32
in the container's natural signedness — 8-bit is UNSIGNED 0..255 (per spec),
16/24/32-bit are signed two's complement; float32 comes back as float32.
Arrays are shape (n_samples, n_channels), channel-interleaved order
preserved.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Malformed or unsupported RIFF/WAVE input (loud, typed — never a
    silent wrong decode)."""


# format codes we implement; every other code raises by name
_FMT_PCM = 1
_FMT_IEEE_FLOAT = 3
_KNOWN_CODES = {
    2: "ADPCM",
    6: "a-law",
    7: "mu-law",
    17: "IMA ADPCM",
    80: "MPEG",
    85: "MP3",
    65534: "WAVE_FORMAT_EXTENSIBLE",
}

_PCM_RANGE = {
    8: (0, 255),  # 8-bit PCM is unsigned per the WAVE spec
    16: (-(1 << 15), (1 << 15) - 1),
    24: (-(1 << 23), (1 << 23) - 1),
    32: (-(1 << 31), (1 << 31) - 1),
}


def write_wav(
    samples: np.ndarray, rate: int, bits: int = 16, fmt: str = "pcm"
) -> bytes:
    """Encode an (n_samples, n_channels) array as a RIFF/WAVE byte string.

    fmt='pcm': bits in {8, 16, 24, 32}, integer samples range-checked
    against the bit depth (8-bit unsigned, others signed).
    fmt='float': bits must be 32, samples stored as IEEE float32 (format
    code 3, with the spec-required `fact` chunk for non-PCM).
    Odd-length data chunks get the spec pad byte (reachable: 24-bit mono
    with an odd sample count)."""
    if samples.ndim != 2:
        raise WavError(f"samples must be (n, channels), got ndim={samples.ndim}")
    n, ch = samples.shape
    if ch < 1:
        raise WavError("n_channels must be >= 1")
    if rate < 1:
        raise WavError(f"invalid sample rate {rate}")
    if fmt == "pcm":
        if bits not in _PCM_RANGE:
            raise WavError(f"PCM bit depth {bits} not in {{8, 16, 24, 32}}")
        if not np.issubdtype(samples.dtype, np.integer):
            raise WavError(f"PCM samples must be integers, got {samples.dtype}")
        lo, hi = _PCM_RANGE[bits]
        if n and (samples.min() < lo or samples.max() > hi):
            raise WavError(
                f"sample out of range for {bits}-bit PCM "
                f"([{lo}, {hi}]): [{samples.min()}, {samples.max()}]"
            )
        code = _FMT_PCM
        if bits == 8:
            data = samples.astype(np.uint8).tobytes()
        elif bits == 16:
            data = samples.astype("<i2").tobytes()
        elif bits == 24:
            u = samples.astype("<i4").view(np.uint32)
            b = np.empty((n, ch, 3), dtype=np.uint8)
            b[:, :, 0] = u & 0xFF
            b[:, :, 1] = (u >> 8) & 0xFF
            b[:, :, 2] = (u >> 16) & 0xFF
            data = b.tobytes()
        else:
            data = samples.astype("<i4").tobytes()
    elif fmt == "float":
        if bits != 32:
            raise WavError(f"float WAVE requires bits=32, got {bits}")
        code = _FMT_IEEE_FLOAT
        data = samples.astype("<f4").tobytes()
    else:
        raise WavError(f"fmt must be 'pcm' or 'float', got {fmt!r}")

    block_align = ch * (bits // 8)
    byte_rate = rate * block_align
    fmt_body = struct.pack("<HHIIHH", code, ch, rate, byte_rate, block_align, bits)
    if code != _FMT_PCM:
        fmt_body += struct.pack("<H", 0)  # cbSize=0, spec for non-PCM
    chunks = [(b"fmt ", fmt_body)]
    if code != _FMT_PCM:
        chunks.append((b"fact", struct.pack("<I", n)))  # spec-required non-PCM
    chunks.append((b"data", data))

    body = bytearray(b"WAVE")
    for cid, payload in chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"  # RIFF odd-size pad byte
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def parse_wav(buf: bytes) -> dict:
    """Validate the container and return header fields + raw sample bytes:
    {code, fmt, channels, rate, byte_rate, block_align, bits, n_samples,
    data (bytes), chunks (ids seen, in order)} — metadata-only callers skip
    the array materialization.

    Contract: malformed input raises WavError — including byte-level
    corruption that would otherwise surface as IndexError / ValueError /
    struct.error from a walk step the explicit length checks missed — so
    Arrow-UDF callers can dead-letter one bad row instead of failing the
    task."""
    try:
        return _parse_wav(buf)
    except WavError:
        raise
    except (IndexError, ValueError, struct.error) as exc:
        raise WavError(f"malformed WAVE container: {exc}") from exc


def _parse_wav(buf: bytes) -> dict:
    if len(buf) < 12:
        raise WavError(f"buffer too short for a RIFF header ({len(buf)} bytes)")
    if buf[0:4] != b"RIFF":
        raise WavError(f"bad RIFF magic {buf[0:4]!r}")
    declared = struct.unpack_from("<I", buf, 4)[0]
    if declared + 8 != len(buf):
        raise WavError(
            f"RIFF size mismatch: header declares {declared + 8} bytes, "
            f"buffer has {len(buf)}"
        )
    if buf[8:12] != b"WAVE":
        raise WavError(f"bad WAVE form type {buf[8:12]!r}")

    pos, end = 12, len(buf)
    fmt_body: bytes | None = None
    data: bytes | None = None
    seen: list[str] = []
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        if pos + 8 + size > end:
            raise WavError(
                f"truncated chunk {cid!r}: declares {size} bytes, "
                f"{end - pos - 8} remain"
            )
        payload = buf[pos + 8 : pos + 8 + size]
        seen.append(cid.decode("latin-1"))
        if cid == b"fmt ":
            if fmt_body is not None:
                raise WavError("duplicate fmt chunk")
            fmt_body = payload
        elif cid == b"data":
            if data is not None:
                raise WavError("duplicate data chunk")
            data = payload
        # unknown chunks (LIST, fact, cue , ...) are skipped by size
        pos += 8 + size + (size % 2)  # odd sizes carry a pad byte
    if pos != end:
        raise WavError(f"{end - pos} trailing bytes after the last chunk")
    if fmt_body is None:
        raise WavError("missing fmt chunk")
    if data is None:
        raise WavError("missing data chunk")
    if len(fmt_body) < 16:
        raise WavError(f"fmt chunk too short ({len(fmt_body)} bytes, need 16)")
    code, ch, rate, byte_rate, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt_body, 0
    )
    if code not in (_FMT_PCM, _FMT_IEEE_FLOAT):
        name = _KNOWN_CODES.get(code, "unknown")
        raise WavError(
            f"unsupported WAVE format code {code} ({name}); this baseline "
            "codec decodes PCM (1) and IEEE float32 (3) only"
        )
    if ch < 1:
        raise WavError("fmt declares 0 channels")
    if rate < 1:
        raise WavError(f"fmt declares invalid sample rate {rate}")
    if code == _FMT_PCM and bits not in _PCM_RANGE:
        raise WavError(f"unsupported PCM bit depth {bits} (not 8/16/24/32)")
    if code == _FMT_IEEE_FLOAT and bits != 32:
        raise WavError(f"IEEE float WAVE requires 32 bits, fmt declares {bits}")
    if block_align != ch * (bits // 8):
        raise WavError(
            f"block_align {block_align} != channels*bytes_per_sample "
            f"{ch * (bits // 8)}"
        )
    if byte_rate != rate * block_align:
        raise WavError(f"byte_rate {byte_rate} != rate*block_align {rate * block_align}")
    if len(data) % block_align:
        raise WavError(
            f"data size {len(data)} is not a multiple of block_align {block_align}"
        )
    return {
        "code": code,
        "fmt": "pcm" if code == _FMT_PCM else "float",
        "channels": ch,
        "rate": rate,
        "byte_rate": byte_rate,
        "block_align": block_align,
        "bits": bits,
        "n_samples": len(data) // block_align,
        "data": data,
        "chunks": seen,
    }


def decode_wav(buf: bytes) -> tuple[np.ndarray, int, int, str]:
    """Decode to ((n_samples, n_channels) array, rate, bits, fmt). PCM
    returns int32 (8-bit unsigned 0..255, wider depths signed); float
    returns float32."""
    m = parse_wav(buf)
    ch, bits, data = m["channels"], m["bits"], m["data"]
    if m["code"] == _FMT_IEEE_FLOAT:
        arr = np.frombuffer(data, dtype="<f4").reshape(-1, ch)
        return arr, m["rate"], bits, "float"
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 24:
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        arr = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        arr -= (arr & 0x800000) << 1  # sign-extend bit 23
    else:
        arr = np.frombuffer(data, dtype="<i4").astype(np.int32)
    return arr.reshape(-1, ch), m["rate"], bits, "pcm"
