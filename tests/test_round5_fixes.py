"""Regression pins for the round-5 final-session review-fix batch:

1. typed-error contract: byte-corrupt JPEG/AVI/WAV input raises the
   module's typed error (JpegError/AviError/WavError), never a bare
   IndexError/ValueError/struct.error — the dead-letter handling in
   image_features / frame_sample catches ONLY the typed errors, so an
   untyped escape fails a whole Arrow task on one bad row;
2. decode_from_parse: the split decode tail is bit-identical to
   decode_jpeg (the roundtrip verifiers entropy-decode once, not twice);
3. k_core peel-broadcast bound: forcing the shuffle path (bound = 0)
   yields the identical core — the broadcast is a hint, not semantics;
4. pagerank_fixed rounds=0 returns the uniform init ranks (the dense
   form's r0), hits_fixed rejects rounds < 1 loudly;
5. _spread_keys: a one-split key frame is spread to defaultParallelism
   partitions before the codec pass (the single-split serialization fix).
"""

import numpy as np
import pytest

from aira_spark.avio import AviError, parse_avi
from aira_spark.jpegio import (
    JpegError,
    decode_from_parse,
    decode_jpeg,
    parse_jpeg,
    write_jpeg,
)
from aira_spark.wavio import WavError, parse_wav

CORRUPT_JPEG = [
    b"\xff\xd8\xff\xc4\x00\x04\x00\x00",  # truncated DHT value list
    b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x10\x00\x10\x03",  # truncated SOF comps
    b"\xff\xd8\xff\xda\x00\x04\x02\x00",  # SOS component spec cut short
    b"\xff\xd8\xff\xdb\x00\x43\x00" + b"\x01" * 10,  # truncated DQT payload
]


@pytest.mark.parametrize("buf", CORRUPT_JPEG)
def test_parse_jpeg_corrupt_raises_typed(buf):
    with pytest.raises(JpegError):
        parse_jpeg(buf)


def test_parse_avi_corrupt_raises_typed():
    for buf in [
        b"RIFF\x10\x00\x00\x00AVI LIST",  # declared size > physical
        b"RIFF\x04\x00\x00\x00AVI ",  # declared size < physical
    ]:
        with pytest.raises(AviError):
            parse_avi(buf)


def test_parse_wav_corrupt_raises_typed():
    for buf in [
        b"RIFF\x08\x00\x00\x00WAVEfmt ",  # trailing garbage after chunks
        b"RIFF\x20\x00\x00\x00WAVEfmt \x10\x00\x00\x00" + b"\x00" * 4,
    ]:
        with pytest.raises(WavError):
            parse_wav(buf)


def _tri(h, w, nc, k=0):
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    s = np.arange(nc)[None, None, :]
    return (255 - np.abs(255 - (r * 5 + c * 3 + k + s * 37) % 510)).astype(np.uint8)


@pytest.mark.parametrize("nc,quality,ri", [(1, 75, 0), (3, 85, 2), (3, 95, 3)])
def test_decode_from_parse_matches_decode_jpeg(nc, quality, ri):
    src = _tri(24, 32, nc, k=7)
    buf = write_jpeg(src, quality=quality, restart_interval=ri)
    assert np.array_equal(decode_jpeg(buf), decode_from_parse(parse_jpeg(buf)))


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_k_core_shuffle_path_matches_broadcast_path(spark, monkeypatch):
    from aira_spark.operators import graph

    # path 1-2-3 hanging off a 4-clique {10,11,12,13}: k=3 peels the path
    # (and nothing else) over two rounds, exercising the delta decrement
    pairs = [(1, 2), (2, 3), (3, 10)]
    for i, a in enumerate([10, 11, 12, 13]):
        for b in [10, 11, 12, 13][i + 1 :]:
            pairs.append((a, b))
    expected = sorted(
        graph.k_core(_edges(spark, pairs), k=3).collect(), key=lambda r: r.node
    )
    monkeypatch.setattr(graph, "PEEL_BROADCAST_MAX", 0)  # force the shuffle join
    forced = sorted(
        graph.k_core(_edges(spark, pairs), k=3).collect(), key=lambda r: r.node
    )
    assert [tuple(r) for r in forced] == [tuple(r) for r in expected]
    assert {r.node for r in expected} == {10, 11, 12, 13}
    assert all(r.core_deg == 3 for r in expected)


def test_pagerank_rounds_zero_is_uniform_init(spark):
    from aira_spark.operators.graph import INIT_MICROS, pagerank_fixed

    edges = _edges(spark, [(1, 2), (1, 3), (2, 1), (2, 3), (3, 1), (3, 2)])
    rows = pagerank_fixed(edges, out_degree=2, rounds=0).collect()
    assert len(rows) == 3
    assert all(r.rank_micros == INIT_MICROS for r in rows)


def test_hits_rejects_zero_rounds(spark):
    from aira_spark.operators.graph import hits_fixed

    with pytest.raises(ValueError, match="rounds >= 1"):
        hits_fixed(_edges(spark, [(1, 2)]), rounds=0)


def test_spread_keys_fans_out_single_split(spark):
    from aira_spark.operators.multimodal import _spread_keys

    keys = spark.range(500).selectExpr("id AS k").coalesce(1)
    assert keys.rdd.getNumPartitions() == 1
    spread = _spread_keys(keys)
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert spread.count() == 500
