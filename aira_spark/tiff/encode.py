"""Synthetic TIFF/BigTIFF writer for deterministic test/bench inputs.

Emits exactly the surface the reference decodes (SURVEY.md §2.1): Classic and
BigTIFF, II/MM byteorders, strips/tiles (with non-divisible edge chunks),
chunky/planar, None/PackBits/Deflate compression, integer (2) and float (3)
predictors, and GeoTIFF georeferencing tags (ModelPixelScale 33550 +
ModelTiepoint 33922, /root/reference/crates/aira-tiff/src/tag.rs:176-179).
The output round-trips through aira_spark.tiff.meta / pixels bit-exactly.
"""

from __future__ import annotations

import numpy as np

from . import tags as T
from .meta import TiffError, _div_ceil
from .pixels import apply_float_predictor, apply_int_predictor, compress


def _dtype_to_sample(dtype: np.dtype) -> tuple[int, int]:
    kind = {"u": T.SAMPLE_UNSIGNED, "i": T.SAMPLE_SIGNED, "f": T.SAMPLE_FLOAT}.get(dtype.kind)
    if kind is None:
        raise TiffError(f"Unsupported pixel dtype {dtype}")
    return kind, dtype.itemsize * 8


def _chunk_payload(region: np.ndarray, bo: str, predictor: int, compression: int) -> bytes:
    """region: (rows, cols, samples) native array -> encoded chunk bytes."""
    if predictor == T.PREDICTOR_FLOAT:
        raw = apply_float_predictor(region).tobytes()
    elif predictor == T.PREDICTOR_HORIZONTAL:
        raw = apply_int_predictor(region).astype(region.dtype.newbyteorder(bo)).tobytes()
    elif predictor == T.PREDICTOR_NONE:
        raw = region.astype(region.dtype.newbyteorder(bo)).tobytes()
    else:
        raise TiffError(f"Unsupported predictor {predictor}")
    return compress(raw, compression)


def write_tiff(
    pixels: np.ndarray,
    byteorder: str = "<",
    layout: tuple = ("strips", 32),
    compression: int = T.COMPRESSION_NONE,
    predictor: int = T.PREDICTOR_NONE,
    planar: int = T.PLANAR_CHUNKY,
    big: bool = False,
    geo: tuple | None = None,
    description: str | None = None,
    software: str | None = None,
    resolution: tuple | None = None,
    artist: str | None = None,
    datetime: str | None = None,
    subfile_type: int | None = None,
    crs: int | None = 4326,
) -> bytes:
    """Serializes (h, w) or (h, w, spp) pixels into a complete TIFF file.

    geo = ((scale_x, scale_y, scale_z), (i, j, k, x, y, z)) — the affine
    geotransform: world_x = x + (col - i) * scale_x, world_y = y - (row - j) * scale_y.
    resolution = (x_num, x_den, y_num, y_den, unit).
    crs: EPSG geographic CRS code written as a GeoKeyDirectory (34735) +
    GeoAsciiParams (34737) citation when `geo` is present; None omits the keys.
    """
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, spp = pixels.shape
    fmt, bits = _dtype_to_sample(pixels.dtype)

    if layout[0] == "strips":
        cw, ch = w, int(layout[1])
        is_tiles = False
    elif layout[0] == "tiles":
        cw, ch = int(layout[1]), int(layout[2])
        is_tiles = True
    else:
        raise TiffError(f"Unknown layout {layout[0]}")
    nx, ny = _div_ceil(w, cw), _div_ceil(h, ch)
    n_grid = ny * nx if is_tiles else ny

    # --- build chunk payloads (plane-major for planar files) ---
    payloads: list[bytes] = []
    planes = range(spp) if planar == T.PLANAR_PLANAR else [None]
    for plane in planes:
        for i in range(n_grid):
            ox = (i % nx) * cw if is_tiles else 0
            oy = (i // nx) * ch if is_tiles else i * ch
            sx = min(cw, w - ox)
            sy = min(ch, h - oy)
            region = pixels[oy : oy + sy, ox : ox + sx, :]
            if plane is not None:
                region = region[:, :, plane : plane + 1]
            if is_tiles and (sx < cw or sy < ch):
                pad = np.zeros((ch, cw, region.shape[2]), dtype=pixels.dtype)
                pad[:sy, :sx, :] = region
                region = pad
            payloads.append(
                _chunk_payload(np.ascontiguousarray(region), byteorder, predictor, compression)
            )

    # --- entry list: (tag, dtype, count, packed value bytes | 'OFFSETS') ---
    bo = byteorder

    def nums(vals, kind):
        return np.asarray(vals, dtype=bo + kind).tobytes()

    def ascii_z(s: str) -> bytes:
        return s.encode("utf-8") + b"\x00"

    long_dt, long_kind = (T.DTYPE_BIG_LONG, "u8") if big else (T.DTYPE_LONG, "u4")
    entries: list[list] = [
        [T.IMAGE_WIDTH, T.DTYPE_LONG, 1, nums([w], "u4")],
        [T.IMAGE_LENGTH, T.DTYPE_LONG, 1, nums([h], "u4")],
        [T.BITS_PER_SAMPLE, T.DTYPE_SHORT, spp, nums([bits] * spp, "u2")],
        [T.COMPRESSION, T.DTYPE_SHORT, 1, nums([compression], "u2")],
        [
            T.PHOTOMETRIC_INTERPRETATION,
            T.DTYPE_SHORT,
            1,
            nums([T.INTERP_RGB if spp == 3 else T.INTERP_BLACK_IS_ZERO], "u2"),
        ],
        [T.SAMPLES_PER_PIXEL, T.DTYPE_SHORT, 1, nums([spp], "u2")],
        [T.SAMPLE_FORMAT, T.DTYPE_SHORT, spp, nums([fmt] * spp, "u2")],
        [T.PLANAR_CONFIGURATION, T.DTYPE_SHORT, 1, nums([planar], "u2")],
    ]
    n_chunks = len(payloads)
    byte_counts = [len(p) for p in payloads]
    if is_tiles:
        entries += [
            [T.TILE_WIDTH, T.DTYPE_LONG, 1, nums([cw], "u4")],
            [T.TILE_LENGTH, T.DTYPE_LONG, 1, nums([ch], "u4")],
            [T.TILE_OFFSETS, long_dt, n_chunks, "OFFSETS"],
            [T.TILE_BYTE_COUNTS, long_dt, n_chunks, nums(byte_counts, long_kind)],
        ]
    else:
        entries += [
            [T.ROWS_PER_STRIP, T.DTYPE_LONG, 1, nums([ch], "u4")],
            [T.STRIP_OFFSETS, long_dt, n_chunks, "OFFSETS"],
            [T.STRIP_BYTE_COUNTS, long_dt, n_chunks, nums(byte_counts, long_kind)],
        ]
    if predictor != T.PREDICTOR_NONE:
        entries.append([T.PREDICTOR, T.DTYPE_SHORT, 1, nums([predictor], "u2")])
    if resolution is not None:
        xn, xd, yn, yd, unit = resolution
        entries.append([T.XRESOLUTION, T.DTYPE_RATIONAL, 1, nums([xn, xd], "u4")])
        entries.append([T.YRESOLUTION, T.DTYPE_RATIONAL, 1, nums([yn, yd], "u4")])
        entries.append([T.RESOLUTION_UNIT, T.DTYPE_SHORT, 1, nums([unit], "u2")])
    if description is not None:
        d = ascii_z(description)
        entries.append([T.IMAGE_DESCRIPTION, T.DTYPE_ASCII, len(d), d])
    if software is not None:
        s = ascii_z(software)
        entries.append([T.SOFTWARE, T.DTYPE_ASCII, len(s), s])
    if artist is not None:
        a = ascii_z(artist)
        entries.append([T.ARTIST, T.DTYPE_ASCII, len(a), a])
    if datetime is not None:
        # decoder enforces 'YYYY:MM:DD HH:MM:SS' (meta.py DATE_TIME branch)
        dtb = ascii_z(datetime)
        entries.append([T.DATE_TIME, T.DTYPE_ASCII, len(dtb), dtb])
    if subfile_type is not None:
        entries.append([T.NEW_SUBFILE_TYPE, T.DTYPE_LONG, 1, nums([subfile_type], "u4")])
    if geo is not None:
        scale, tiepoint = geo
        entries.append([T.MODEL_PIXEL_SCALE, T.DTYPE_DOUBLE, 3, nums(list(scale), "f8")])
        entries.append([T.MODEL_TIEPOINT, T.DTYPE_DOUBLE, 6, nums(list(tiepoint), "f8")])
        if crs is not None:
            # GeoKeyDirectory: header {version 1, rev 1.0, N keys} + one row
            # per key {id, tag-location, count, value}; the citation lives in
            # GeoAsciiParams ('|'-terminated per the GeoTIFF spec)
            citation = f"EPSG:{crs}|"
            keys = [
                (1024, 0, 1, 2),              # GTModelType = geographic
                (1025, 0, 1, 1),              # GTRasterType = PixelIsArea
                (1026, T.GEO_ASCII_PARAMS, len(citation), 0),  # citation
                (2048, 0, 1, crs),            # GeographicType = EPSG code
            ]
            kd = [1, 1, 0, len(keys)] + [v for k in keys for v in k]
            entries.append(
                [T.GEO_KEY_DIRECTORY, T.DTYPE_SHORT, len(kd), nums(kd, "u2")]
            )
            ga = citation.encode("ascii") + b"\x00"
            entries.append([T.GEO_ASCII_PARAMS, T.DTYPE_ASCII, len(ga), ga])
    entries.sort(key=lambda e: e[0])

    # --- lay out the file: header | IFD | external values | chunk data ---
    if big:
        header_size, entry_size, count_size, next_size, inline_max, off_kind = 16, 20, 8, 8, 8, "u8"
    else:
        header_size, entry_size, count_size, next_size, inline_max, off_kind = 8, 12, 2, 4, 4, "u4"
    ifd_offset = header_size
    ifd_size = count_size + len(entries) * entry_size + next_size
    ext_base = ifd_offset + ifd_size

    ext_off = ext_base
    ext_offsets: dict[int, int] = {}
    offsets_entry_nbytes = n_chunks * T.DTYPE_SIZE[long_dt]
    for k, (tag, dtype, count, val) in enumerate(entries):
        nbytes = T.DTYPE_SIZE[dtype] * count
        if nbytes > inline_max:
            ext_off += ext_off % 2  # keep word alignment
            ext_offsets[k] = ext_off
            ext_off += nbytes

    data_off = ext_off + ext_off % 2
    chunk_offsets = []
    for p in payloads:
        chunk_offsets.append(data_off)
        data_off += len(p) + (len(p) % 2)

    # fill in the offsets entry now that chunk positions are known
    for e in entries:
        if e[3] == "OFFSETS":
            e[3] = nums(chunk_offsets, long_kind)

    # --- serialize ---
    out = bytearray(data_off)
    sig = b"II" if bo == "<" else b"MM"
    out[0:2] = sig
    out[2:4] = nums([43 if big else 42], "u2")
    if big:
        out[4:6] = nums([8], "u2")
        out[6:8] = nums([0], "u2")
        out[8:16] = nums([ifd_offset], "u8")
    else:
        out[4:8] = nums([ifd_offset], "u4")

    pos = ifd_offset
    out[pos : pos + count_size] = nums([len(entries)], "u8" if big else "u2")
    pos += count_size
    for k, (tag, dtype, count, val) in enumerate(entries):
        out[pos : pos + 2] = nums([tag], "u2")
        out[pos + 2 : pos + 4] = nums([dtype], "u2")
        out[pos + 4 : pos + 4 + count_size if big else pos + 8] = (
            nums([count], "u8") if big else nums([count], "u4")
        )
        vpos = pos + (12 if big else 8)
        nbytes = T.DTYPE_SIZE[dtype] * count
        if nbytes <= inline_max:
            out[vpos : vpos + nbytes] = val
        else:
            eo = ext_offsets[k]
            out[vpos : vpos + inline_max] = nums([eo], off_kind)
            out[eo : eo + nbytes] = val
        pos += entry_size
    # next-IFD pointer = 0 (single page)
    out[pos : pos + next_size] = nums([0], off_kind)

    for off, p in zip(chunk_offsets, payloads):
        out[off : off + len(p)] = p
    return bytes(out)


def concat_tiff_pages(bufs: list[bytes]) -> bytes:
    """Chain single-page TIFF buffers into one multi-page file.

    Reference semantics: the directory chain is a singly linked list — each
    IFD's trailing word points at the next (decoder.rs:117-174); offset 0
    terminates. Every absolute offset inside page i (external entry values,
    strip/tile chunk offsets, the IFD position itself) shifts by the page's
    placement base. All pages must share byteorder and version.
    """
    from .meta import read_header, walk_directories

    if not bufs:
        raise TiffError("No pages to concatenate")
    bo0, ver0, _ = read_header(bufs[0])
    header_size = 16 if ver0 == 43 else 8
    inline_max = 8 if ver0 == 43 else 4
    count_size = 8 if ver0 == 43 else 2
    entry_size = 20 if ver0 == 43 else 12
    off_kind = "u8" if ver0 == 43 else "u4"
    next_size = inline_max

    def nums(vals, kind):
        return np.asarray(vals, dtype=bo0 + kind).tobytes()

    out = bytearray(bufs[0])
    # position of page-0's next-IFD pointer (IFD directly after the header)
    _, _, dirs0 = walk_directories(bufs[0])
    next_ptr_pos = header_size + count_size + len(dirs0[0].entries) * entry_size

    for buf in bufs[1:]:
        bo, ver, _ = read_header(buf)
        if (bo, ver) != (bo0, ver0):
            raise TiffError("Page byteorder/version mismatch")
        out += b"\x00" * (len(out) % 2)  # word alignment
        base = len(out)
        shift = base - header_size
        page = bytearray(buf[header_size:])

        # patch this page's offsets in place (IFD sits at its header_size)
        _, _, dirs = walk_directories(buf)
        d = dirs[0]
        epos = count_size  # relative to page start (= buf header_size)
        for e_idx in range(len(d.entries)):
            e = d.entries[e_idx]
            nbytes = T.DTYPE_SIZE[e.dtype] * e.count
            vpos = epos + entry_size - inline_max
            if nbytes > inline_max:
                old = int(np.frombuffer(page[vpos : vpos + inline_max], bo0 + off_kind)[0])
                page[vpos : vpos + inline_max] = nums([old + shift], off_kind)
            if e.tag in (T.STRIP_OFFSETS, T.TILE_OFFSETS):
                # chunk offsets live inline or at the (already shifted) target
                kind = {3: "u2", 4: "u4", 16: "u8", 13: "u4"}[e.dtype]
                ksz = T.DTYPE_SIZE[e.dtype]
                if nbytes <= inline_max:
                    loc = vpos
                else:
                    # the pointer was shifted above; its target's position
                    # within `page` is (absolute - base)
                    loc = (
                        int(np.frombuffer(page[vpos : vpos + inline_max], bo0 + off_kind)[0])
                        - base
                    )
                vals = np.frombuffer(
                    page[loc : loc + nbytes], dtype=bo0 + kind, count=e.count
                ).astype(np.int64)
                page[loc : loc + nbytes] = nums((vals + shift).tolist(), kind)
            epos += entry_size

        out += page
        # link previous chain tail -> this page's IFD (at `base`)
        out[next_ptr_pos : next_ptr_pos + next_size] = nums([base], off_kind)
        next_ptr_pos = base + count_size + len(d.entries) * entry_size

    return bytes(out)
