"""Pure stdlib+numpy RIFF/AVI container codec for MJPEG video (encode and
decode), built on the baseline JPEG codec (aira_spark.jpegio) for frames.

Container discipline is the wavio/TIFF one (byte-level walk mirroring the
reference reader's IFD discipline, /root/reference/crates/aira-tiff/src/):
RIFF magic + size validated against the physical buffer, nested LIST chunks
walked generically with the spec's odd-size pad bytes, cross-field header
validation (stream count, frame count vs movi contents, dims vs strf), and
every malformed or unsupported input raises a typed `AviError` naming the
field — compressed codecs other than MJPG (XVID, H264, ...) are refused BY
NAME, never silently misdecoded, the same unsupported-codec error contract
as the reference's compression dispatch
(/root/reference/crates/aira-tiff/src/compression.rs:100-104).

MJPEG-in-AVI is the one video format a pure-numpy stack can do honestly:
every frame is a complete baseline JPEG in a '00dc' chunk, so decode
composes the already-verified jpegio path with a container walk — no
inter-frame prediction state. The optional idx1 index is written (every
frame keyframe-flagged, the MJPEG invariant) and, when present on read,
validated against the movi chunks actually found.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegio import JpegError, decode_jpeg, write_jpeg


class AviError(ValueError):
    """Malformed or unsupported RIFF/AVI input (loud, typed — never a
    silent wrong decode)."""


_KNOWN_CODECS = {
    b"XVID": "XviD MPEG-4",
    b"DIVX": "DivX MPEG-4",
    b"H264": "H.264/AVC",
    b"IV50": "Indeo 5",
    b"CVID": "Cinepak",
    b"\x00\x00\x00\x00": "uncompressed RGB",
}


def _chunks(buf: bytes, pos: int, end: int, ctx: str):
    """Yield (fourcc, payload_start, size) walking [pos, end); enforces the
    RIFF odd-size pad byte and raises on truncation."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        if pos + 8 + size > end:
            raise AviError(
                f"truncated chunk {cid!r} in {ctx}: declares {size} bytes, "
                f"{end - pos - 8} remain"
            )
        yield cid, pos + 8, size
        pos += 8 + size + (size % 2)
    if pos != end:
        raise AviError(f"{end - pos} trailing bytes after the last chunk in {ctx}")


def write_mjpeg_avi(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Encode same-shaped (h, w, 1|3) uint8 frames as an MJPEG AVI: LIST
    hdrl (avih + one vids/MJPG stream with strh/strf) + LIST movi of '00dc'
    JPEG chunks + idx1 (all keyframes). fps is exposed as dwRate/dwScale."""
    if not frames:
        raise AviError("write_mjpeg_avi needs at least one frame")
    if fps < 1:
        raise AviError(f"invalid fps {fps}")
    h, w = frames[0].shape[:2]
    payloads = []
    for i, f in enumerate(frames):
        if f.shape[:2] != (h, w):
            raise AviError(
                f"frame {i} shape {f.shape[:2]} != stream dims ({h}, {w}); "
                "AVI streams are fixed-dimension"
            )
        payloads.append(write_jpeg(f, quality=quality))
    n = len(payloads)
    max_bytes = max(len(p) for p in payloads)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate (fps = dwRate/dwScale)
        0,  # dwStart
        n,  # dwLength (frames)
        max_bytes,  # dwSuggestedBufferSize
        0,  # dwQuality
        0,  # dwSampleSize (0 = variable, one frame per chunk)
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        h * w * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,
    )

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b""
        )

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    idx = b""
    for p in payloads:
        # idx1 offset convention: from the start of the 'movi' fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(p))
        movi_body += chunk(b"00dc", p)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(buf: bytes) -> dict:
    """Validate the container and return {width, height, fps, n_frames,
    codec, frames: [(offset, size)], chunks: [top-level ids]} without
    decoding any frame — metadata-only callers stop here.

    Contract: malformed input raises AviError — including byte-level
    corruption that would otherwise surface as IndexError / ValueError /
    struct.error from a walk step the explicit length checks missed — so
    Arrow-UDF callers can dead-letter one bad row instead of failing the
    task."""
    try:
        return _parse_avi(buf)
    except AviError:
        raise
    except (IndexError, ValueError, struct.error) as exc:
        raise AviError(f"malformed AVI container: {exc}") from exc


def _parse_avi(buf: bytes) -> dict:
    if len(buf) < 12:
        raise AviError(f"buffer too short for a RIFF header ({len(buf)} bytes)")
    if buf[0:4] != b"RIFF":
        raise AviError(f"bad RIFF magic {buf[0:4]!r}")
    declared = struct.unpack_from("<I", buf, 4)[0]
    if declared + 8 != len(buf):
        raise AviError(
            f"RIFF size mismatch: header declares {declared + 8} bytes, "
            f"buffer has {len(buf)}"
        )
    if buf[8:12] != b"AVI ":
        raise AviError(f"bad form type {buf[8:12]!r} (want b'AVI ')")

    avih = strh = strf = None
    movi_span = None
    idx1 = None
    seen: list[str] = []

    def walk_list(pos: int, end: int, ctx: str) -> None:
        nonlocal avih, strh, strf, movi_span, idx1
        for cid, at, size in _chunks(buf, pos, end, ctx):
            if ctx == "top":
                seen.append(cid.decode("latin-1"))
            if cid == b"LIST":
                if size < 4:
                    raise AviError(f"LIST chunk in {ctx} too short for a type")
                ltype = buf[at : at + 4]
                if ltype == b"movi":
                    if movi_span is not None:
                        raise AviError("duplicate movi list")
                    movi_span = (at + 4, at + size)
                else:
                    walk_list(at + 4, at + size, ltype.decode("latin-1"))
            elif cid == b"avih":
                if avih is not None:
                    raise AviError("duplicate avih header")
                avih = buf[at : at + size]
            elif cid == b"strh":
                if strh is None:  # first stream only; extras checked below
                    strh = buf[at : at + size]
            elif cid == b"strf":
                if strf is None:
                    strf = buf[at : at + size]
            elif cid == b"idx1":
                idx1 = buf[at : at + size]
            # other chunks (JUNK, INFO, vedt...) skipped by size

    walk_list(12, len(buf), "top")
    if avih is None:
        raise AviError("missing avih main header")
    if len(avih) < 40:
        raise AviError(f"avih too short ({len(avih)} bytes, need >= 40)")
    (usec_pf, _, _, _, total_frames, _, n_streams, _, w, h) = struct.unpack_from(
        "<IIIIIIIIII", avih, 0
    )
    if n_streams != 1:
        raise AviError(
            f"avih declares {n_streams} streams; this baseline container "
            "supports exactly one MJPG video stream"
        )
    if strh is None or len(strh) < 48:
        raise AviError("missing or short strh stream header")
    fcc_type, handler = struct.unpack_from("<4s4s", strh, 0)
    scale, rate = struct.unpack_from("<II", strh, 20)
    if fcc_type != b"vids":
        raise AviError(f"stream type {fcc_type!r} is not a video stream")
    if strf is None or len(strf) < 40:
        raise AviError("missing or short strf (BITMAPINFOHEADER)")
    bw, bh = struct.unpack_from("<ii", strf, 4)
    compression = strf[16:20]
    if handler != b"MJPG" or compression != b"MJPG":
        codec = handler if handler != b"MJPG" else compression
        name = _KNOWN_CODECS.get(codec, "unknown")
        raise AviError(
            f"unsupported video codec {codec!r} ({name}); this baseline "
            "container decodes MJPG (motion JPEG) only"
        )
    if (bw, abs(bh)) != (w, h):
        raise AviError(f"strf dims ({bw}, {abs(bh)}) != avih dims ({w}, {h})")
    if movi_span is None:
        raise AviError("missing movi list (no frame data)")
    if scale < 1 or rate < 1:
        raise AviError(f"invalid stream rate {rate}/{scale}")

    frames: list[tuple[int, int]] = []
    for cid, at, size in _chunks(buf, movi_span[0], movi_span[1], "movi"):
        if cid[2:4] in (b"dc", b"db"):  # compressed / uncompressed video
            frames.append((at, size))
        # non-video movi chunks (audio '01wb', subtitles) would land here;
        # with n_streams validated to 1 above, anything else is malformed
        elif cid != b"JUNK":
            raise AviError(f"unexpected movi chunk {cid!r} in a 1-stream file")
    if len(frames) != total_frames:
        raise AviError(
            f"avih declares {total_frames} frames, movi holds {len(frames)}"
        )
    if idx1 is not None:
        if len(idx1) % 16:
            raise AviError(f"idx1 size {len(idx1)} is not a multiple of 16")
        if len(idx1) // 16 != len(frames):
            raise AviError(
                f"idx1 holds {len(idx1) // 16} entries for {len(frames)} frames"
            )
        movi_fourcc = movi_span[0] - 4
        for i in range(len(frames)):
            off, sz = struct.unpack_from("<II", idx1, i * 16 + 8)
            if (movi_fourcc + off + 8, sz) != frames[i]:
                raise AviError(f"idx1 entry {i} does not match movi chunk {i}")
    return {
        "width": w,
        "height": h,
        "fps": rate / scale,
        "usec_per_frame": usec_pf,
        "n_frames": len(frames),
        "codec": "mjpeg",
        "frames": frames,
        "chunks": seen,
    }


def decode_frame(buf: bytes, meta: dict, idx: int) -> np.ndarray:
    """Decode one frame by index via the baseline JPEG codec; dims are
    cross-checked against the stream header."""
    if not 0 <= idx < meta["n_frames"]:
        raise AviError(f"frame index {idx} out of range 0..{meta['n_frames'] - 1}")
    at, size = meta["frames"][idx]
    try:
        px = decode_jpeg(buf[at : at + size])
    except JpegError as exc:
        raise AviError(f"frame {idx}: {exc}") from exc
    if px.shape[:2] != (meta["height"], meta["width"]):
        raise AviError(
            f"frame {idx} decodes to {px.shape[:2]}, stream declares "
            f"({meta['height']}, {meta['width']})"
        )
    return px


def iter_frames(buf: bytes, every_n: int = 1):
    """Yield (frame_idx, pixels) for frames 0, every_n, 2*every_n, ... —
    the frame-sampling read path (only the sampled '00dc' payloads are
    JPEG-decoded; skipped frames cost one chunk-walk step each)."""
    meta = parse_avi(buf)
    for i in range(0, meta["n_frames"], max(1, every_n)):
        yield i, decode_frame(buf, meta, i)
