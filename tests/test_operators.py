"""Operator-level unit tests: top-k variants, as-of/range joins,
multimodal plumbing, sessionization edges."""

import datetime

import pytest
from pyspark.sql import functions as F

from local_data_pipeline_spark.operators.joins import asof_join, range_join_buckets
from local_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_features,
    frame_sample_plan,
    media_stats,
    _fake_features,
)
from local_data_pipeline_spark.operators.topk import (
    salted_top1,
    top1_per_group,
    top1_per_group_agg,
)
from local_data_pipeline_spark.operators.windows import sessionize


def _events(spark):
    rows = [
        # key, ts, v
        ("a", "2026-01-01 10:00:00", 1.0),
        ("a", "2026-01-01 11:00:00", 5.0),
        ("a", "2026-01-01 12:00:00", 5.0),  # tie on v -> later ts wins
        ("b", "2026-01-01 10:30:00", 2.0),
    ]
    return spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )


def test_top1_variants_agree(spark):
    df = _events(spark)
    order = [F.desc("v"), F.desc("ts")]
    a = {(r.k, str(r.ts)) for r in top1_per_group(df, ["k"], order).collect()}
    b = {
        (r.k, str(r.ts))
        for r in top1_per_group_agg(df, ["k"], ["v", "ts"]).collect()
    }
    c = {(r.k, str(r.ts)) for r in salted_top1(df, ["k"], order).collect()}
    expected = {("a", "2026-01-01 12:00:00"), ("b", "2026-01-01 10:30:00")}
    assert a == b == c == expected


def test_asof_join_at_or_before_and_strict(spark):
    left = spark.createDataFrame(
        [(1, "2026-01-01 10:00:00"), (1, "2026-01-01 12:00:00")],
        "k long, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2026-01-01 09:00:00", "r1"), (1, "2026-01-01 10:00:00", "r2"),
         (1, "2026-01-01 13:00:00", "r3")],
        "k long, rts string, tag string",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "tag")

    at_or_before = asof_join(left, right, "k", "ts", "rts", ["rts", "tag"])
    got = {str(r.ts): r.tag for r in at_or_before.collect()}
    assert got == {"2026-01-01 10:00:00": "r2", "2026-01-01 12:00:00": "r2"}

    strict = asof_join(left, right, "k", "ts", "rts", ["rts", "tag"], strict=True)
    got_s = {str(r.ts): r.tag for r in strict.collect()}
    assert got_s == {"2026-01-01 10:00:00": "r1", "2026-01-01 12:00:00": "r2"}


def test_asof_join_no_prior_right_row_is_null(spark):
    left = spark.createDataFrame([(7, "2026-01-01 08:00:00")], "k long, ts string")
    left = left.select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(7, "2026-01-01 09:00:00", "late")], "k long, rts string, tag string"
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "tag")
    out = asof_join(left, right, "k", "ts", "rts", ["tag"]).collect()
    assert len(out) == 1 and out[0].tag is None


def test_range_join_buckets(spark):
    points = spark.createDataFrame(
        [(1, "2026-01-01 10:30:00"), (1, "2026-01-01 15:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    intervals = spark.createDataFrame(
        [(1, "2026-01-01 10:00:00", "2026-01-01 11:00:00", "i1"),
         (1, "2026-01-01 14:00:00", "2026-01-01 14:30:00", "i2")],
        "k long, s string, e string, tag string",
    ).select(
        "k",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "tag",
    )
    out = range_join_buckets(points, intervals, "k", "ts", "s", "e")
    got = [(str(r.ts), r.tag) for r in out.collect()]
    assert got == [("2026-01-01 10:30:00", "i1")]


def test_sessionize_gap_boundary(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, "2026-01-01 10:00:00", 0.0),
            (2, 10, "2026-01-01 10:30:00", 0.0),  # exactly at gap: same session
            (3, 10, "2026-01-01 11:00:01", 0.0),  # 30m01s -> new session
        ],
        "event_id long, user_id long, ts string, value double",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = sessionize(ev, gap="30 minutes")
    sessions = {r.event_id: r.session_id for r in out.collect()}
    assert sessions == {1: 1, 2: 1, 3: 2}


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNGfake1"), (64, 48, None, None, "image/png")),
        (2, "image", bytearray(b"\x89PNGfake2"), (32, 32, None, None, "image/png")),
        (3, "video", bytearray(b"RIFFfake"), (640, 480, None, 3500, "video/mp4")),
        (4, "audio", bytearray(b"ID3fake"), (None, None, 16000, 2000, "audio/mp3")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_multimodal_feature_extraction_deterministic(spark, media):
    out = decode_image_features(media)
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].n_bytes == 9
    assert len(rows[1].features) == 16
    assert all(0.0 <= v < 1.0 for v in rows[1].features)
    # deterministic: same bytes -> exactly the same features, and they
    # match the driver-side reference implementation
    expected = _fake_features(b"\x89PNGfake1")
    assert [pytest.approx(v, abs=1e-6) for v in expected] == list(rows[1].features)
    assert rows[1].features != rows[2].features


def test_multimodal_requires_real_decoder_seam(spark, media):
    """Round-5 semantics: compressed codecs (these blobs are fake
    PNG/RIFF/MP3) hit the NotImplementedError seam at EXECUTION under
    require_real_decoder — uncompressed formats now really decode."""
    with pytest.raises(Exception, match="decoder seam|NotImplementedError"):
        decode_image_features(media, require_real_decoder=True).collect()


def _ppm_p6(w, h, pixels, maxval=255, comment=False):
    hdr = b"P6\n"
    if comment:
        hdr += b"# planted comment\n"
    hdr += f"{w} {h}\n{maxval}\n".encode()
    return hdr + bytes(pixels)


def test_multimodal_real_ppm_decode_known_pixels(spark):
    """Round-5 addition: the dependency-free REAL decoder — a planted
    2x2 P6 PPM with known pixels yields exact pixel statistics, under
    require_real_decoder=True (no fake fallback involved)."""
    # pixels: red, green, blue, white (row-major RGB)
    px = [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    blob = _ppm_p6(2, 2, px, comment=True)
    media = spark.createDataFrame(
        [(1, "image", bytearray(blob), (2, 2, None, None, "image/x-ppm"))],
        MEDIA_SCHEMA,
    )
    (row,) = decode_image_features(media, require_real_decoder=True).collect()
    f = list(row.features)
    assert f[0] == 1.0  # real-decode marker
    assert (f[1], f[2], f[4]) == (2.0, 2.0, 255.0)
    # channel means: each channel = (255 + 255)/4 = 127.5
    assert f[5] == f[6] == f[7] == pytest.approx(127.5)
    # luma of the 4 pixels: 0.299/0.587/0.114*255 and 255
    lumas = [0.299 * 255, 0.587 * 255, 0.114 * 255, 255.0]
    assert f[12] == pytest.approx(min(lumas), abs=1e-4)
    assert f[13] == pytest.approx(max(lumas), abs=1e-4)


def test_multimodal_real_bmp_and_pgm_decode(spark):
    """24-bit BMP (bottom-up, BGR, padded rows) and P5 grayscale decode
    to the same stats as the equivalent PPM."""
    import struct

    # 2x1 BMP: pixels left->right red, blue (stored BGR, row padded to 8)
    row = bytes([0, 0, 255, 255, 0, 0]) + b"\x00\x00"
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(row), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(row), 0, 0, 0, 0)
        + row
    )
    pgm = b"P5\n2 1\n255\n" + bytes([10, 200])
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(bmp), (2, 1, None, None, "image/bmp")),
            (2, "image", bytearray(pgm), (2, 1, None, None, "image/x-pgm")),
        ],
        MEDIA_SCHEMA,
    )
    rows = {
        r.media_id: list(r.features)
        for r in decode_image_features(
            media, require_real_decoder=True
        ).collect()
    }
    # BMP: mean R = (255+0)/2, mean G = 0, mean B = (0+255)/2
    assert rows[1][5] == pytest.approx(127.5)
    assert rows[1][6] == 0.0
    assert rows[1][7] == pytest.approx(127.5)
    # PGM replicated to RGB: all channel means = (10+200)/2
    assert rows[2][5] == rows[2][6] == rows[2][7] == pytest.approx(105.0)
    # min/max luma equal the gray values exactly
    assert rows[2][12] == pytest.approx(10.0, abs=1e-9)
    assert rows[2][13] == pytest.approx(200.0, abs=1e-9)


def test_frame_sample_plan_and_stats(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [r.frame_offset_ms for r in frames] == [0, 1000, 2000]
    stats = {r.modality: r for r in media_stats(media).collect()}
    assert stats["image"].n == 2
    assert stats["video"].max_duration_ms == 3500


def test_resize_images_stub_shape_and_determinism(spark, media):
    from local_data_pipeline_spark.operators.multimodal import resize_images

    out = {r.media_id: r for r in resize_images(media, 4, 3).collect()}
    # only image rows are resized; video/audio rows don't enter the op
    assert set(out) == {1, 2}
    for r in out.values():
        assert (r.width, r.height) == (4, 3)
        assert len(r.content) == 4 * 3 * 3  # RGB-sized target payload
    # deterministic in (bytes, target dims): re-run byte-identical,
    # different sources differ
    again = {r.media_id: r for r in resize_images(media, 4, 3).collect()}
    assert bytes(out[1].content) == bytes(again[1].content)
    assert bytes(out[1].content) != bytes(out[2].content)
    with pytest.raises(NotImplementedError):
        resize_images(media, 4, 3, require_real_decoder=True)


def test_salted_join_matches_plain_join_on_skewed_data(spark):
    from local_data_pipeline_spark.operators.joins import salted_join

    # 10k rows, 95% on one hot key — the classic straggler shape
    left = spark.range(10000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("left_id"),
    )
    right = spark.createDataFrame([(i, f"dim{i}") for i in range(50)], "k long, name string")
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", n_salts=8)
    assert salted.count() == plain.count()
    a = {(r.k, r.left_id, r.name) for r in plain.collect()}
    b = {(r.k, r.left_id, r.name) for r in salted.collect()}
    assert a == b


def test_table_docs_persisted(spark):
    from local_data_pipeline_spark.registry import Registry

    reg = Registry()

    @reg.model("documented_tbl", materialization="table",
               description="the curated output table")
    def _m(r, s):
        return s.range(3)

    reg.build(spark)
    # qualified name: the registry also registers a temp view under the
    # bare name, which SHOW TBLPROPERTIES would hit instead of the table
    comment = [
        r.data_type
        for r in spark.sql("DESCRIBE EXTENDED default.documented_tbl").collect()
        if r.col_name == "Comment"
    ]
    assert comment == ["the curated output table"]
    props = {
        r.key: r.value
        for r in spark.sql("SHOW TBLPROPERTIES default.documented_tbl").collect()
    }
    assert props.get("group") == "default"


def test_distributed_cumsum_equals_global_window(spark):
    """The scale-path prefix sum (range shards + offset broadcast) must
    equal the single-task global-window cumsum exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.operators.packing import distributed_cumsum
    from local_data_pipeline_spark.session import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.length("text").cast("bigint").alias("v")
    )
    got = {
        r.doc_id: r.cs
        for r in distributed_cumsum(
            d, "doc_id", "v", out_col="cs", n_partitions=7
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.doc_id: r.cs
        for r in d.withColumn("cs", F.sum("v").over(w) - F.col("v")).collect()
    }
    assert got == want


def test_distributed_ntile_matches_native_ntile(spark):
    """The scalable ntile (distributed rank + closed-form buckets) must
    reproduce SQL ntile semantics exactly, including the uneven-bucket
    edge (n % k != 0) and n < k."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.operators.packing import distributed_ntile
    from local_data_pipeline_spark.session import load_table

    c = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_acctbal"
    )
    for k in (7, 10):  # 150 % 7 != 0 exercises the uneven split
        got = {
            r.c_custkey: r.b
            for r in distributed_ntile(
                c, ["c_acctbal", "c_custkey"], k, out_col="b", n_partitions=5
            ).collect()
        }
        w = Window.orderBy("c_acctbal", "c_custkey")
        want = {
            r.c_custkey: r.b
            for r in c.withColumn("b", F.ntile(k).over(w).cast("bigint")).collect()
        }
        assert got == want

    tiny = c.limit(3)
    got = sorted(
        r.b
        for r in distributed_ntile(
            tiny, ["c_acctbal", "c_custkey"], 10, out_col="b"
        ).collect()
    )
    assert got == [1, 2, 3]  # n < k: one row per leading bucket


def test_segment_dedup_flags_planted_boilerplate(spark):
    """Two docs sharing an exact 20-token span: the later doc's copy is
    dropped, the first occurrence and all unique spans are kept."""
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.queries import QUERIES
    import os
    import tempfile

    span = " ".join(f"tok{i}" for i in range(20))
    uniq_a = " ".join(f"aaa{i}" for i in range(20))
    uniq_b = " ".join(f"bbb{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, f"{span} {uniq_a}", "en", "s", 0),
            (2, f"{span} {uniq_b}", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r.doc_id: (r.n_segments, r.n_kept, r.n_dropped)
            for r in QUERIES["segment_dedup_documents"].fn(spark, td).collect()
        }
    assert out == {1: (2, 2, 0), 2: (2, 1, 1)}


def test_rebuild_deduped_documents_emits_clean_text(spark):
    """The rebuild variant must emit the surviving text itself: doc 2
    loses the shared boilerplate span but keeps its unique span, doc 1
    is intact, and a doc that is ALL boilerplate disappears."""
    import os
    import tempfile

    from local_data_pipeline_spark.queries import QUERIES

    span = " ".join(f"tok{i}" for i in range(20))
    uniq_a = " ".join(f"aaa{i}" for i in range(20))
    uniq_b = " ".join(f"bbb{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, f"{span} {uniq_a}", "en", "s", 0),
            (2, f"{span} {uniq_b}", "en", "s", 0),
            (3, span, "en", "s", 0),  # pure boilerplate
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r.doc_id: (r.n_kept, r.clean_text)
            for r in QUERIES["rebuild_deduped_documents"].fn(spark, td).collect()
        }
    assert out[1] == (2, f"{span} {uniq_a}")
    assert out[2] == (1, uniq_b)
    assert 3 not in out


def test_ngrams_udtf_matches_explode_shape(spark):
    """The UDTF (API-surface coverage) must agree with the fast explode
    shape on real documents."""
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.functions.python_udfs import register_python_udfs
    from local_data_pipeline_spark.functions.text import tokens
    from local_data_pipeline_spark.session import load_table

    register_python_udfs(spark)
    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    d.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, g.pos, g.ngram FROM udtf_docs d, LATERAL ngrams(d.text, 3) g"
    )
    # sequence(0, -1) would DESCEND, not be empty — filter short docs
    # instead (the UDTF yields nothing for them anyway)
    t = d.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 3
    )
    want = t.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 3),
                lambda i: F.array_join(F.slice(F.col("t"), i + 1, 3), " "),
            )
        ).alias("pos", "ngram"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_distributed_ntile_descending_order_matches_native(spark):
    """Descending order specs ((col, 'desc') tuples) must reproduce
    native ntile over the same DESC window — the RFM f/m quartile shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.operators.packing import distributed_ntile
    from local_data_pipeline_spark.session import load_table

    c = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_acctbal"
    )
    got = {
        r.c_custkey: r.b
        for r in distributed_ntile(
            c,
            [("c_acctbal", "desc"), ("c_custkey", "asc")],
            4,
            out_col="b",
            n_partitions=5,
        ).collect()
    }
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    want = {
        r.c_custkey: r.b
        for r in c.withColumn("b", F.ntile(4).over(w).cast("bigint")).collect()
    }
    assert got == want


def test_distributed_lead_equals_global_window(spark):
    """Sharded lead + boundary patch must equal the single-task global
    lead exactly, including the NULL on the global maximum."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.operators.packing import distributed_lead
    from local_data_pipeline_spark.session import load_table

    ids = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id")
        .distinct()
    )
    got = {
        r.event_id: r.nxt
        for r in distributed_lead(
            ids, "event_id", out_col="nxt", n_partitions=7
        ).collect()
    }
    w = Window.orderBy("event_id")
    want = {
        r.event_id: r.nxt
        for r in ids.withColumn("nxt", F.lead("event_id").over(w)).collect()
    }
    assert got == want
    assert sum(1 for v in got.values() if v is None) == 1  # only the max


def test_distributed_lead_nullable_value_col(spark):
    """Round-5 ADVICE fix: with a nullable value_col, a mid-shard row whose
    successor's value is NULL must keep a NULL lead (the old coalesce patch
    wrongly substituted the next shard's first value); only each shard's
    true last row is boundary-patched."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.operators.packing import distributed_lead

    # every 3rd value NULL, including values adjacent to shard boundaries
    rows = [(i, None if i % 3 == 0 else f"v{i}") for i in range(1, 101)]
    df = spark.createDataFrame(rows, "ord int, val string")
    got = {
        r.ord: r.nxt
        for r in distributed_lead(
            df, "ord", value_col="val", out_col="nxt", n_partitions=7
        ).collect()
    }
    w = Window.orderBy("ord")
    want = {
        r.ord: r.nxt
        for r in df.withColumn("nxt", F.lead("val").over(w)).collect()
    }
    assert got == want
