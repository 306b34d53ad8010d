"""Multimodal column operators: binary payload -> typed features.

Images/audio/video ride as opaque `binary` columns with typed metadata; all
transforms are Arrow-batched mapInPandas with explicit schemas and bounded
batch shapes. TIFF decode is REAL (aira_spark.tiff); JPEG/PNG/audio/video
codecs are STUBBED (no PIL/ffmpeg in this container) behind
NotImplementedError with a clearly-marked deterministic fake for plumbing
tests — the Spark-side schema / partitioning / UDF signatures are the real
design and are exercised by tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as Ty

from ..functions.udfs import _decode_full
from ..tiff.meta import TiffError

FEATURE_SCHEMA = Ty.StructType(
    [
        Ty.StructField("image_id", Ty.StringType()),
        Ty.StructField("n_channels", Ty.IntegerType()),
        Ty.StructField("mean", Ty.ArrayType(Ty.DoubleType())),
        Ty.StructField("std", Ty.ArrayType(Ty.DoubleType())),
        Ty.StructField("thumb8", Ty.ArrayType(Ty.DoubleType())),  # 8x8 block means, ch 0
        Ty.StructField("error", Ty.StringType()),
    ]
)


def _block_mean_8(px: np.ndarray) -> np.ndarray:
    a = px[:, :, 0].astype(np.float64)
    h, w = a.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    out = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            out[i, j] = a[ys[i] : max(ys[i + 1], ys[i] + 1),
                          xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    return out.flatten()


def decode_image(fmt: str, payload: bytes) -> np.ndarray:
    """Format dispatch. TIFF is real; other codecs are stubs."""
    if fmt.startswith("tiff"):
        _, px = _decode_full(payload)
        return px
    if fmt.startswith("fake-"):
        # deterministic fake frame derived from the payload hash — plumbing-only
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    raise NotImplementedError(
        f"codec for fmt={fmt!r} not available in this environment (no PIL/ffmpeg); "
        "plug a decoder into decode_image()"
    )


def image_features(images: DataFrame) -> DataFrame:
    """(image_id, n_channels, mean[], std[], thumb8[], error) per image."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                try:
                    px = decode_image(rec.fmt, bytes(rec.bytes))
                    f = px.astype(np.float64)
                    rows.append(
                        (
                            rec.image_id,
                            px.shape[2],
                            f.mean(axis=(0, 1)).round(6).tolist(),
                            f.std(axis=(0, 1)).round(6).tolist(),
                            _block_mean_8(px).round(6).tolist(),
                            None,
                        )
                    )
                except (TiffError, NotImplementedError) as exc:
                    rows.append((rec.image_id, None, None, None, None, str(exc)))
            yield pd.DataFrame(rows, columns=FEATURE_SCHEMA.fieldNames())

    return images.select("image_id", "fmt", "bytes").mapInPandas(fn, schema=FEATURE_SCHEMA)


def _area_pool_floor(px: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Integer-exact area pooling (downsample only): target pixel (tr, tc) =
    floor(mean) of the source block [tr*h//th, (tr+1)*h//th) x [tc*w//tw,
    (tc+1)*w//tw), per channel. Exact in int64 so the result is reproducible
    bit-for-bit by SQL integer arithmetic (no float summation-order drift)."""
    h, w, _ = px.shape
    if th > h or tw > w:
        raise ValueError("area pooling is downsample-only (target > source)")
    a = px.astype(np.int64)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    sums = np.add.reduceat(np.add.reduceat(a, ys, axis=0), xs, axis=1)
    counts = (ye - ys)[:, None] * (xe - xs)[None, :]
    return (sums // counts[:, :, None]).astype(px.dtype)


def resize_images(images: DataFrame, th: int, tw: int) -> DataFrame:
    """Real thumbnail/resize operator for the TIFF path: decode -> integer
    area pooling -> re-encode as a valid (chunky, uncompressed) TIFF with the
    geotransform rescaled so the footprint is preserved. Returns
    (image_id, bytes) — a derived images table (training-data thumbnailing).
    """
    from ..tiff import tags as T
    from ..tiff.encode import write_tiff
    from ..tiff.meta import entry_value

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                buf = bytes(rec.bytes)
                try:
                    m, px = _decode_full(buf)
                except TiffError:
                    continue
                small = _area_pool_floor(px, th, tw)
                geo = None
                scale = m["custom"].get(T.MODEL_PIXEL_SCALE)
                tie = m["custom"].get(T.MODEL_TIEPOINT)
                if scale is not None and tie is not None:
                    sv = entry_value(*scale, m["byteorder"])
                    tv = entry_value(*tie, m["byteorder"])
                    # re-anchor the tiepoint at pixel (0, 0): the source tie
                    # may reference pixel (tie_i, tie_j) != (0, 0)
                    tx0 = tv[3] - tv[0] * sv[0]
                    ty0 = tv[4] + tv[1] * sv[1]
                    geo = (
                        (sv[0] * px.shape[1] / tw, sv[1] * px.shape[0] / th, 0.0),
                        (0.0, 0.0, 0.0, tx0, ty0, 0.0),
                    )
                rows.append(
                    (rec.image_id, write_tiff(small, byteorder="<",
                                              layout=("strips", 8), geo=geo))
                )
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    return images.select("image_id", "bytes").mapInPandas(
        fn, schema="image_id string, bytes binary"
    )


FRAME_SCHEMA = Ty.StructType(
    [
        Ty.StructField("media_id", Ty.StringType()),
        Ty.StructField("frame_idx", Ty.IntegerType()),
        Ty.StructField("frame", Ty.BinaryType()),
        Ty.StructField("error", Ty.StringType()),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing (STUB codec): (media_id, frame_idx, frame).

    The partitioning/batching contract is real — one media row fans out to
    ceil(n_frames / every_n) frame rows inside the Arrow batch; the frame
    decode itself raises NotImplementedError for real codecs and emits
    deterministic fakes for fmt='fake-video'.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                if rec.fmt == "fake-video":
                    n_frames = 1 + len(bytes(rec.bytes)) % 50
                    for i in range(0, n_frames, every_n):
                        digest = hashlib.sha256(bytes(rec.bytes) + i.to_bytes(4, "little"))
                        rows.append((rec.media_id, i, digest.digest(), None))
                else:
                    rows.append(
                        (rec.media_id, None, None,
                         f"codec for fmt={rec.fmt!r} not available (stub)")
                    )
            yield pd.DataFrame(rows, columns=FRAME_SCHEMA.fieldNames())

    return media.select("media_id", "fmt", "bytes").mapInPandas(fn, schema=FRAME_SCHEMA)


def patchify(images: DataFrame, patch: int = 16) -> DataFrame:
    """(image_id, patch_row, patch_col, ph, pw, px_sum, px_min, px_max):
    fixed-grid patch extraction over band 0 — the ViT-style training-data
    primitive (one row per patch; edge patches are clipped, not padded, and
    their true ph/pw are emitted so a consumer can pad or drop).

    Map-side only: one decode per image, numpy block reduction per patch;
    patch STATISTICS cross Arrow, never pixel buffers — the 100 TB shape for
    corpus-level patch curation (filtering blank/low-variance patches before
    the expensive bytes are ever shipped)."""
    cols = ["image_id", "patch_row", "patch_col", "ph", "pw",
            "px_sum", "px_min", "px_max"]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for rec in pdf.itertuples(index=False):
                try:
                    _, px = _decode_full(rec.bytes, max_bands=1)
                except TiffError:
                    continue
                a = px[:, :, 0].astype(np.int64)
                h, w = a.shape
                for pr in range((h + patch - 1) // patch):
                    r0, r1 = pr * patch, min((pr + 1) * patch, h)
                    for pc in range((w + patch - 1) // patch):
                        c0, c1 = pc * patch, min((pc + 1) * patch, w)
                        blk = a[r0:r1, c0:c1]
                        out.append(
                            (rec.image_id, pr, pc, r1 - r0, c1 - c0,
                             int(blk.sum()), int(blk.min()), int(blk.max()))
                        )
            yield pd.DataFrame(out, columns=cols)

    return images.select("image_id", "bytes").mapInPandas(
        fn,
        schema="image_id string, patch_row int, patch_col int, ph int, pw int, "
               "px_sum long, px_min long, px_max long",
    )
