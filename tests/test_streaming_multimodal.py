"""Streaming operators (batch/stream equivalence) and multimodal UDF
plumbing.

EXPECTED SKIP COUNT: exactly ONE test in this module skips in any
environment — the Pillow guard pair is complementary by design:
``test_decode_images_without_pillow_raises`` runs only when Pillow is
ABSENT (this container: it runs) and
``test_decode_images_real_path_with_pillow`` only when Pillow is
PRESENT (this container: the suite's single skip). A suite report with
more than one skip means something else regressed — investigate, don't
shrug."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


# --- streaming ------------------------------------------------------------

def test_windowed_counts_stream_matches_batch(spark):
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        windowed_event_counts,
    )

    batch = windowed_event_counts(load_table(spark, SF_DIR, "events"))
    stream = windowed_event_counts(read_event_stream(spark, SF_DIR))
    assert stream.isStreaming
    got = run_stream_to_memory(stream, "win_counts", spark)
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and len(a) > 0


def test_session_window_stream_matches_batch(spark):
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        session_window_stats,
    )

    batch = session_window_stats(load_table(spark, SF_DIR, "events"))
    stream = session_window_stats(read_event_stream(spark, SF_DIR))
    got = run_stream_to_memory(stream, "sess_stats", spark)
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, got.collect()))


def test_streaming_dedup(spark):
    from aerovaldb_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        streaming_dedup,
    )

    stream = streaming_dedup(read_event_stream(spark, SF_DIR))
    got = run_stream_to_memory(stream, "dedup_ev", spark, output_mode="append")
    n = got.count()
    assert n == got.select("event_id").distinct().count() > 0


def test_quality_filter_stream_matches_batch(spark):
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        quality_filtered_documents,
        read_document_stream,
        run_stream_to_memory,
    )

    batch = quality_filtered_documents(load_table(spark, SF_DIR, "documents"))
    stream = quality_filtered_documents(read_document_stream(spark, SF_DIR))
    assert stream.isStreaming
    got = run_stream_to_memory(
        stream, "quality_docs", spark, output_mode="append"
    )
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and 0 < len(a) < load_table(spark, SF_DIR, "documents").count()


def test_chunker_stream_matches_batch(spark):
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        chunked_documents,
        read_document_stream,
        run_stream_to_memory,
    )

    batch = chunked_documents(load_table(spark, SF_DIR, "documents"))
    stream = chunked_documents(read_document_stream(spark, SF_DIR))
    assert stream.isStreaming
    got = run_stream_to_memory(stream, "chunked_docs", spark, output_mode="append")
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and len(a) > load_table(spark, SF_DIR, "documents").count()


def test_sampler_stream_matches_batch_and_replays_identically(spark):
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        read_document_stream,
        run_stream_to_memory,
        sampled_documents,
    )

    batch = sampled_documents(load_table(spark, SF_DIR, "documents"))
    stream = sampled_documents(read_document_stream(spark, SF_DIR))
    assert stream.isStreaming
    got = run_stream_to_memory(stream, "sampled_docs", spark, output_mode="append")
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    # full replay (fresh query, same source) yields the identical
    # sample: the keep flag is a pure function of the row
    replay = run_stream_to_memory(
        sampled_documents(read_document_stream(spark, SF_DIR)),
        "sampled_docs_replay",
        spark,
        output_mode="append",
    )
    c = sorted(map(tuple, replay.collect()))
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert a == b == c and 0 < len(a) < n_docs


def test_stateful_running_totals(spark):
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        running_user_totals,
    )

    batch = running_user_totals(load_table(spark, SF_DIR, "events"))
    stream = running_user_totals(read_event_stream(spark, SF_DIR))
    got = run_stream_to_memory(stream, "run_totals", spark, output_mode="update")
    # update mode: keep the LAST emission per user (final state)
    final = {}
    for row in got.collect():
        final[row["user_id"]] = (row["n_events"], round(row["total_value"], 2))
    want = {
        row["user_id"]: (row["n_events"], round(row["total_value"], 2))
        for row in batch.collect()
    }
    assert final == want and len(want) > 0


# --- multimodal -----------------------------------------------------------

@pytest.fixture(scope="module")
def media(spark):
    from aerovaldb_spark.functions import synthetic_media

    return synthetic_media(spark, 60).cache()


def test_media_schema(media):
    from aerovaldb_spark.functions import MEDIA_SCHEMA

    assert media.schema == MEDIA_SCHEMA
    assert media.count() == 60


def test_decode_images_stub(media):
    from aerovaldb_spark.functions import decode_images

    out = decode_images(media)
    rows = out.collect()
    assert len(rows) == 20  # every third media item is an image
    r = {row["media_id"]: row for row in rows}
    assert r[0]["decoder"] == "stub-sha256"
    assert r[0]["n_pixels"] == r[0]["width"] * r[0]["height"]
    assert 0.0 <= r[0]["mean_luma"] <= 1.0
    # deterministic: same input → same fake luma
    again = {row["media_id"]: row for row in decode_images(media).collect()}
    assert r[0]["mean_luma"] == again[0]["mean_luma"]


def test_decode_images_stub_immune_to_pillow_presence(media, monkeypatch):
    """Installing Pillow must never change or crash the DEFAULT stub
    path (round-3 regression: an inverted guard raised
    NotImplementedError whenever PIL imported). Inject a fake PIL that
    explodes on attribute access: the stub path must not touch it."""
    import sys
    import types

    fake = types.ModuleType("PIL")

    class _Boom:
        def __getattr__(self, name):
            raise AssertionError("stub path must never touch PIL")

    fake.Image = _Boom()
    monkeypatch.setitem(sys.modules, "PIL", fake)

    from aerovaldb_spark.functions import decode_images

    rows = decode_images(media).collect()
    assert len(rows) == 20
    assert all(r["decoder"] == "stub-sha256" for r in rows)


def test_decode_images_use_real_fails_fast_without_pillow(media):
    """use_real=True checks the codec dependency driver-side at call
    time — a missing Pillow is an immediate ImportError, not a task
    failure deep inside an executor."""
    import importlib.util

    import pytest

    from aerovaldb_spark.functions import decode_images

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("Pillow installed; covered by the real-path test")
    with pytest.raises(ImportError, match="use_real=True"):
        decode_images(media, use_real=True)


def test_decode_images_real_path_with_pillow(spark):
    """Real decode end-to-end (runs wherever Pillow is installed):
    encode solid-color PNGs with Pillow, decode via
    decode_images(use_real=True), and check dimensions, pixel count,
    and mean luma against the known solid color."""
    import io

    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")

    from aerovaldb_spark.functions import MEDIA_SCHEMA, decode_images

    rows = []
    colors = [(255, 255, 255), (0, 0, 0), (255, 0, 0), (10, 200, 60)]
    for i, rgb in enumerate(colors):
        w, h = 32 + 8 * i, 24 + 4 * i
        img = PIL_Image.new("RGB", (w, h), rgb)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append((i, "image", buf.getvalue(), w, h, None, "png"))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    out = {r["media_id"]: r for r in decode_images(media, use_real=True).collect()}
    assert len(out) == len(colors)
    for i, (r_, g, b) in enumerate(colors):
        w, h = 32 + 8 * i, 24 + 4 * i
        expect_luma = (r_ * 299 + g * 587 + b * 114) // 1000 / 255.0
        row = out[i]
        assert (row["width"], row["height"]) == (w, h)
        assert row["n_pixels"] == w * h
        assert row["decoder"] == "pillow-png"
        assert abs(row["mean_luma"] - expect_luma) < 0.005


def test_parse_media_headers_from_real_bytes(media):
    """Header parsing reads the PAYLOAD BYTES (PNG IHDR / WAV fmt),
    not the metadata columns — parsed values must agree with what the
    generator declared."""
    from aerovaldb_spark.functions import WAV_SAMPLE_RATE, parse_media_headers

    parsed = {r["media_id"]: r for r in parse_media_headers(media).collect()}
    declared = {r["media_id"]: r for r in media.collect()}
    assert len(parsed) == 60
    for mid, r in parsed.items():
        d = declared[mid]
        if d["kind"] == "image":
            assert (r["header_format"], r["header_width"], r["header_height"]) \
                == ("png", d["width"], d["height"])
            assert r["sample_rate"] is None
        elif d["kind"] == "audio":
            assert r["sample_rate"] == WAV_SAMPLE_RATE
            assert r["header_format"] is None
        else:  # video stub payload has no parseable container header
            assert r["header_format"] is None and r["sample_rate"] is None


def test_parse_image_dims_gif_and_jpeg():
    from aerovaldb_spark.functions.multimodal import parse_image_dims

    gif = (
        b"GIF89a"
        + (320).to_bytes(2, "little")
        + (200).to_bytes(2, "little")
        + b"\x00" * 8
    )
    assert parse_image_dims(gif) == ("gif", 320, 200)
    jpg = (
        b"\xff\xd8\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
        + b"\x00" * 9
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
        + b"\x03" + b"\x00" * 10
    )
    assert parse_image_dims(jpg) == ("jpeg", 640, 480)
    assert parse_image_dims(b"plainly not an image") is None


def test_extract_features(media):
    from aerovaldb_spark.functions import extract_features

    out = extract_features(media, dim=16).collect()
    assert len(out) == 60
    assert all(len(r["features"]) == 16 for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r["features"])


def test_sample_frames(media):
    from aerovaldb_spark.functions import sample_frames

    out = sample_frames(media, every_ms=5000)
    rows = out.collect()
    assert len(rows) > 0
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for frames in by_media.values():
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(idxs)))
        assert all(len(f["frame_payload"]) == 16 for f in frames)


def test_sniff_image_extension():
    from aerovaldb_spark.functions import sniff_image_extension

    assert sniff_image_extension(b"\x89PNG\r\n\x1a\nxxxx") == ".png"
    assert sniff_image_extension(b"\xff\xd8\xff\xe0rest") == ".jpg"
    assert sniff_image_extension(b"GIF89a...") == ".gif"
    assert sniff_image_extension(b"RIFF\x00\x00\x00\x00WEBPVP8") == ".webp"
    assert sniff_image_extension(b"\x00\x00\x00 ftypavifrest") == ".avif"
    assert sniff_image_extension(b"garbage") is None


def test_q51_binary_manifest(spark):
    from aerovaldb_spark.functions.multimodal import q51_binary_manifest

    out = q51_binary_manifest(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 500
    for r in rows[:20]:
        # n_bytes >= n_chars always; equality iff pure-ASCII text
        assert r["n_bytes"] >= r["n_bytes"] - r["multibyte_extra"]
        assert r["multibyte_extra"] >= 0
        assert len(r["payload_md5"]) == 32


def test_q52_media_decode_deterministic(spark):
    from aerovaldb_spark.functions.multimodal import q52_media_decode

    a = {r["media_id"]: r for r in q52_media_decode(spark, "unused").collect()}
    b = {r["media_id"]: r for r in q52_media_decode(spark, "unused").collect()}
    assert len(a) == 32 and a == b


def test_q50_threshold_semantics(spark):
    from aerovaldb_spark.operators.similarity import cosine_near_dup_pairs

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0]), (3, [1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {(r["id_a"], r["id_b"]): r["cosine"] for r in
            cosine_near_dup_pairs(df, threshold=0.9).collect()}
    assert (0, 3) in rows and rows[(0, 3)] == 1.0   # exact duplicate pair
    assert (0, 1) in rows                            # near-duplicate
    assert not any(2 in pair for pair in rows)       # orthogonal vector excluded


def test_stream_ingest_into_store(spark, tmp_path):
    """File-source stream → foreachBatch bulk_import → point reads,
    including cross-batch last-writer-wins."""
    import json

    from pyspark.sql import types as T

    from aerovaldb_spark.db import AerovalSparkDB
    from aerovaldb_spark.routes import Route
    from aerovaldb_spark.streaming import stream_ingest

    src = tmp_path / "incoming"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("project", T.StringType()),
            T.StructField("experiment", T.StringType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"project": "p", "experiment": "e1", "payload": '{"v": 1}'},
                {"project": "p", "experiment": "e2", "payload": '{"v": 2}'},
            ]
        )
    )
    (src / "b2.json").write_text(
        json.dumps({"project": "p", "experiment": "e1", "payload": '{"v": 10}'})
    )

    db = AerovalSparkDB(spark, str(tmp_path / "db"))
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(src))
    q = stream_ingest(
        db, Route.CONFIG, stream,
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    # bulk_import stamps seq per batch; the later micro-batch wins LWW
    assert db.get_config("p", "e2") == {"v": 2}
    assert db.get_config("p", "e1") == {"v": 10}

    # restart against the SAME checkpoint: already-committed batches
    # must not reprocess (exactly-once for readers)
    n_rows_before = db.table(Route.CONFIG).count()
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q2 = stream_ingest(
        db, Route.CONFIG, stream2,
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q2.awaitTermination(120)
    assert db.table(Route.CONFIG).count() == n_rows_before
    # and even a FULL replay (fresh checkpoint) converges to the same
    # read state — LWW makes re-ingest idempotent for readers
    stream3 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q3 = stream_ingest(
        db, Route.CONFIG, stream3,
        checkpoint_dir=str(tmp_path / "ckpt2"), available_now=True,
    )
    q3.awaitTermination(120)
    assert db.get_config("p", "e1") == {"v": 10}
    assert db.get_config("p", "e2") == {"v": 2}


def test_stream_stream_interval_join_matches_batch(spark):
    """purchases_with_recent_clicks: stream-stream interval join with
    two-sided watermarks produces exactly the batch join's rows."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        purchases_with_recent_clicks,
        read_event_stream,
        run_stream_to_memory,
    )

    batch = purchases_with_recent_clicks(load_table(spark, SF_DIR, "events"))
    stream = purchases_with_recent_clicks(read_event_stream(spark, SF_DIR))
    assert stream.isStreaming
    got = run_stream_to_memory(stream, "pwc", spark, output_mode="append")
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and len(a) > 0


def test_stream_static_enrichment(spark):
    """enriched_events: stream-static broadcast join — every event
    passes through (left join), matched rows carry dim columns."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        enriched_events,
        read_event_stream,
        run_stream_to_memory,
    )

    dim = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    events = load_table(spark, SF_DIR, "events")
    batch = enriched_events(events, dim)
    assert batch.count() == events.count()  # left join preserves rows

    stream = enriched_events(read_event_stream(spark, SF_DIR), dim)
    got = run_stream_to_memory(stream, "enriched", spark, output_mode="append")
    assert got.count() == events.count()
    assert got.filter("c_name IS NOT NULL").count() == batch.filter(
        "c_name IS NOT NULL"
    ).count()


def test_minhash_band_cols_match_agg_signatures(spark):
    """The map-only banded signature (stream-capable) must be
    byte-identical to the agg-based one lsh_candidate_pairs buckets
    on — same items, same sort, same join."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.dedup import (
        ROWS_PER_BAND,
        minhash_band_cols,
        minhash_signatures,
    )

    docs = load_table(spark, SF_DIR, "documents")
    agg = (
        minhash_signatures(docs)
        .withColumn("band", (F.col("seed") / ROWS_PER_BAND).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.array_sort(F.collect_list(F.concat_ws(":", "seed", "minhash"))),
            ).alias("band_sig")
        )
    )
    want = {(r["doc_id"], r["band"]): r["band_sig"] for r in agg.collect()}
    got_rows = minhash_band_cols(docs).collect()
    got = {
        (r["doc_id"], b): r[f"bsig_{b}"]
        for r in got_rows
        for b in range(4)
        if r[f"bsig_{b}"] is not None
    }
    assert got == want and len(got) > 0


def test_near_dup_gate_stream_matches_batch(spark):
    """Ingest-time near-dup screen: stateless stream-static LSH join;
    the stream run must flag exactly the docs the batch run flags, and
    flagged docs must be exactly those sharing >=1 band bucket with
    the reference corpus."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        near_dup_gate,
        read_document_stream,
        reference_band_buckets,
        run_stream_to_memory,
    )

    docs = load_table(spark, SF_DIR, "documents")
    # reference corpus = even doc_ids; incoming = all docs (odd ids can
    # still collide with an even near-duplicate's bucket)
    ref = reference_band_buckets(docs.filter(F.col("doc_id") % 2 == 0))
    batch = near_dup_gate(docs, ref).select("doc_id", "near_dup")
    stream = near_dup_gate(read_document_stream(spark, SF_DIR), ref).select(
        "doc_id", "near_dup"
    )
    assert stream.isStreaming
    got = run_stream_to_memory(stream, "near_dup_gate", spark, output_mode="append")
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and len(a) > 0
    # every even doc collides with itself via the reference buckets
    flagged = {d for d, f in a if f}
    evens = {r["doc_id"] for r in docs.filter("doc_id % 2 = 0").collect()}
    text_of = {r["doc_id"]: r["text"] for r in docs.collect()}
    evens_with_shingles = {
        d for d in evens if len(text_of[d].split()) >= 3
    }
    assert evens_with_shingles <= flagged


def test_session_funnel_stream_matches_batch(spark):
    """Streaming session-window funnel produces exactly the batch
    twin's per-session depths."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        session_funnel_stats,
    )

    batch = session_funnel_stats(load_table(spark, SF_DIR, "events"))
    stream = session_funnel_stats(read_event_stream(spark, SF_DIR))
    assert stream.isStreaming
    got = run_stream_to_memory(stream, "session_funnel", spark)
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and len(a) > 0
    depths = {d for _, _, d in a}
    assert depths <= {0, 1, 2, 3} and len(depths) > 1


# ---------------------------------------------------------------- png codec


def test_png_codec_roundtrip_all_channel_counts():
    """encode → decode is pixel-exact for grey, RGB, and RGBA."""
    from aerovaldb_spark.functions import decode_png, encode_png

    for channels in (1, 3, 4):
        w, h = 13, 7  # odd sizes: catches stride bugs
        pixels = bytes(
            (x * 31 + y * 17 + c * 11) % 256
            for y in range(h)
            for x in range(w)
            for c in range(channels)
        )
        payload = encode_png(w, h, pixels, channels=channels)
        assert payload.startswith(b"\x89PNG\r\n\x1a\n")
        got = decode_png(payload)
        assert got == (w, h, channels, pixels)


def test_png_decoder_reverses_all_five_filters():
    """Hand-build an IDAT stream using each scanline filter type
    (None/Sub/Up/Average/Paeth) and check the decoder reconstructs the
    same pixels the identity-filtered encoding yields."""
    import struct
    import zlib

    from aerovaldb_spark.functions import decode_png
    from aerovaldb_spark.functions.png_codec import _chunk, _paeth

    w, h, ch = 6, 5, 3
    stride = w * ch
    pixels = bytes((x * 7 + y * 13 + c * 3) % 256
                   for y in range(h) for x in range(w) for c in range(ch))

    rows = [pixels[y * stride:(y + 1) * stride] for y in range(h)]
    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur, prev = rows[y], rows[y - 1] if y else bytes(stride)
        raw.append(ftype)
        for i in range(stride):
            left = cur[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                raw.append(cur[i])
            elif ftype == 1:
                raw.append((cur[i] - left) & 0xFF)
            elif ftype == 2:
                raw.append((cur[i] - up) & 0xFF)
            elif ftype == 3:
                raw.append((cur[i] - (left + up) // 2) & 0xFF)
            else:
                raw.append((cur[i] - _paeth(left, up, ul)) & 0xFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _chunk(b"IEND", b""))
    assert decode_png(payload) == (w, h, ch, pixels)


def test_png_decoder_rejects_corruption():
    import pytest

    from aerovaldb_spark.functions import decode_png, encode_png

    good = encode_png(4, 4, bytes(48), channels=3)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    # flip one IDAT byte -> CRC mismatch
    idx = good.index(b"IDAT") + 6
    bad = good[:idx] + bytes([good[idx] ^ 0xFF]) + good[idx + 1:]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bad)
    with pytest.raises(ValueError, match="IEND"):
        decode_png(good[:-12])


def test_decode_images_builtin_png_end_to_end(spark):
    """REAL decode end-to-end with no codec dependency: encode known
    pixel data into valid PNGs, run decode_images(decoder='builtin-png')
    through the Arrow-batched mapInPandas path, and check
    width/height/pixel-count/mean-luma against the ground truth."""
    from aerovaldb_spark.functions import MEDIA_SCHEMA, decode_images, encode_png

    rows, expect = [], {}
    colors = [(255, 255, 255), (0, 0, 0), (255, 0, 0), (10, 200, 60)]
    for i, (r, g, b) in enumerate(colors):
        w, h = 32 + 8 * i, 24 + 4 * i
        payload = encode_png(w, h, bytes((r, g, b)) * (w * h), channels=3)
        rows.append((i, "image", payload, w, h, None, "png"))
        expect[i] = (w, h, (0.299 * r + 0.587 * g + 0.114 * b) / 255.0)
    # one corrupt payload: must quarantine (null stats), not fail the job
    rows.append((99, "image", b"\x89PNG\r\n\x1a\nnot-a-real-png", 1, 1, None, "png"))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    out = {r["media_id"]: r for r in
           decode_images(media, decoder="builtin-png").collect()}
    assert len(out) == len(colors) + 1
    for i, (w, h, luma) in expect.items():
        row = out[i]
        assert (row["width"], row["height"], row["n_pixels"]) == (w, h, w * h)
        assert row["decoder"] == "builtin-png"
        assert abs(row["mean_luma"] - luma) < 1e-9
    assert out[99]["decoder"].startswith("error:")
    assert out[99]["width"] is None and out[99]["mean_luma"] is None


def test_decode_images_unknown_decoder_rejected(spark):
    import pytest

    from aerovaldb_spark.functions import decode_images, synthetic_media

    with pytest.raises(ValueError, match="unknown decoder"):
        decode_images(synthetic_media(spark, 3), decoder="magick")


def test_stream_export_corpus_matches_batch(spark, tmp_path):
    """Streaming corpus export lands the same rows and the same
    partitioned layout as the batch export of the same data, and a
    re-run over the same checkpoint does not double-write."""
    import os as _os

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.export_sink import read_corpus
    from aerovaldb_spark.streaming import (
        read_document_stream,
        stream_export_corpus,
    )

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_document_stream(spark, SF_DIR)
    q = stream_export_corpus(stream, out, ckpt, partition_by=("lang",),
                             available_now=True)
    q.awaitTermination()

    docs = load_table(spark, SF_DIR, "documents")
    back = read_corpus(spark, out)
    assert back.count() == docs.count()
    a = sorted(map(tuple, docs.select("doc_id", "lang").collect()))
    b = sorted(map(tuple, back.select("doc_id", "lang").collect()))
    assert a == b
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {d for d in _os.listdir(out)
            if d.startswith("lang=")} == {f"lang={l}" for l in langs}

    # restart over the same checkpoint: no new data -> no duplicates
    q2 = stream_export_corpus(read_document_stream(spark, SF_DIR), out, ckpt,
                              partition_by=("lang",), available_now=True)
    q2.awaitTermination()
    assert read_corpus(spark, out).count() == docs.count()


def test_lm_quality_gate_stream_matches_batch_q76(spark):
    """The streaming LM gate with an uncapped frozen model must score
    every document EXACTLY as the batch q76 does (same rounding, same
    exact Decimal sums), and flag the same docs — on both the batch
    twin and the real stream."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import q76_bigram_lm_nll
    from aerovaldb_spark.streaming import (
        frozen_bigram_lm,
        lm_quality_gate,
        read_document_stream,
        run_stream_to_memory,
    )

    docs = load_table(spark, SF_DIR, "documents")
    model = frozen_bigram_lm(docs)

    expect = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in q76_bigram_lm_nll(spark, SF_DIR).collect()
    }
    assert expect

    batch = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["low_quality"])
        for r in lm_quality_gate(docs, model, threshold=3.42).collect()
    }
    assert set(batch) >= set(expect)
    for d, (n, nll) in expect.items():
        assert batch[d][0] == n
        assert batch[d][1] == nll
        assert batch[d][2] == (nll > 3.42)
    # threshold actually separates (non-vacuous on this corpus)
    flags = {v[2] for v in batch.values()}
    assert flags == {True, False}

    stream = lm_quality_gate(
        read_document_stream(spark, SF_DIR), model, threshold=3.42
    )
    assert stream.isStreaming
    got = run_stream_to_memory(stream, "lm_gate", spark, output_mode="append")
    streamed = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["low_quality"])
        for r in got.collect()
    }
    assert streamed == batch


def test_lm_quality_gate_capped_model_backs_off(spark):
    """A capped model degrades gracefully: unseen bigrams back off to
    count 0 (higher NLL), nothing errors, every doc still scores."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import frozen_bigram_lm, lm_quality_gate

    docs = load_table(spark, SF_DIR, "documents")
    full = frozen_bigram_lm(docs)
    capped = frozen_bigram_lm(docs, max_terms=50)
    a = {r["doc_id"]: r["avg_nll"]
         for r in lm_quality_gate(docs, full).collect()}
    b = {r["doc_id"]: r["avg_nll"]
         for r in lm_quality_gate(docs, capped).collect()}
    assert set(a) == set(b)
    # backoff can only RAISE the NLL (counts drop to 0)
    assert all(b[d] >= a[d] for d in a)
    assert any(b[d] > a[d] for d in a)


def test_embedding_outlier_gate_stream_matches_batch(spark):
    """Stateless frozen-centroid outlier screen: the stream run flags
    exactly the vectors the batch q90 gate drops (modulo documented
    threshold-tie admission), via one stream-static broadcast join."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import label_outlier_gate
    from aerovaldb_spark.streaming import (
        admission_table,
        embedding_outlier_gate,
        read_embedding_stream,
        run_stream_to_memory,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    adm = admission_table(emb, pct=0.10)

    batch = embedding_outlier_gate(emb, adm)
    stream = embedding_outlier_gate(read_embedding_stream(spark, SF_DIR), adm)
    assert stream.isStreaming
    got = run_stream_to_memory(
        stream, "emb_outlier_gate", spark, output_mode="append"
    )
    a = sorted(map(tuple, batch.select("vec_id", "outlier_flagged").collect()))
    b = sorted(map(tuple, got.select("vec_id", "outlier_flagged").collect()))
    assert a == b and len(a) > 0

    # the flag set is the batch gate's drop set, except vectors whose
    # cosine ties the admission threshold exactly (documented: admitted)
    audit = {r["label"]: r for r in label_outlier_gate(emb, 0.10).collect()}
    n_flagged_by_label: dict[int, int] = {}
    ties_by_label: dict[int, int] = {}
    for r in got.collect():
        if r["outlier_flagged"]:
            n_flagged_by_label[r["label"]] = (
                n_flagged_by_label.get(r["label"], 0) + 1
            )
        elif (
            r["centroid_cos"] is not None
            and r["centroid_cos"] == audit[r["label"]]["kept_min_cos"]
        ):
            # at-threshold: gate admits, batch may drop — the ONLY
            # permitted flag deficit, accounted per label
            ties_by_label[r["label"]] = ties_by_label.get(r["label"], 0) + 1
    for label, rep in audit.items():
        flagged = n_flagged_by_label.get(label, 0)
        assert flagged <= rep["n_dropped"]
        assert rep["n_dropped"] - flagged <= ties_by_label.get(label, 0)


def test_resize_images_real_pixels(spark):
    """resize_images is a REAL pixel operation (dependency-free PNG
    codec): output decodes to the exact nearest-neighbor index-map of
    the source pixels; bad payloads quarantine as err rows."""
    import numpy as np

    from pyspark.sql import types as T

    from aerovaldb_spark.functions import MEDIA_SCHEMA
    from aerovaldb_spark.functions.multimodal import resize_images
    from aerovaldb_spark.functions.png_codec import decode_png, encode_png

    rng = np.random.default_rng(11)
    rows, srcs = [], {}
    for i, (w, h, c) in enumerate([(16, 12, 3), (9, 7, 1), (20, 20, 4)]):
        arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        srcs[i] = arr
        rows.append(
            (i, "image", encode_png(w, h, arr.tobytes(), channels=c),
             w, h, None, "png")
        )
    rows.append((99, "image", b"not a png", 1, 1, None, "png"))
    rows.append((100, "image", None, 1, 1, None, "png"))  # NULL payload
    # CRC-valid but degenerate 0x0 PNG: quarantine, not a failed job
    rows.append(
        (101, "image", encode_png(0, 0, b"", channels=1), 0, 0, None, "png")
    )
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in MEDIA_SCHEMA.fields]
    )
    media = spark.createDataFrame(rows, nullable)

    out = {r["media_id"]: r for r in resize_images(media, 8, 6).collect()}
    assert len(out) == 6
    for bad in (99, 100, 101):
        assert out[bad]["payload"] is None
        assert out[bad]["err"].startswith("error:")

    for i, src in srcs.items():
        r = out[i]
        assert r["err"] is None
        assert (r["width"], r["height"]) == (8, 6)
        w2, h2, c2, pixels = decode_png(bytes(r["payload"]))
        assert (w2, h2, c2) == (8, 6, src.shape[2])
        got = np.frombuffer(pixels, dtype=np.uint8).reshape(6, 8, c2)
        h, w = src.shape[:2]
        ys = (np.arange(6) * h) // 6
        xs = (np.arange(8) * w) // 8
        assert np.array_equal(got, src[ys][:, xs]), i


def test_resample_audio_real_samples(spark):
    """resample_audio is a REAL sample-level operation: output WAV
    decodes to the exact nearest-sample index-map of the source PCM;
    non-WAV and unsupported (stereo) payloads quarantine as err rows."""
    import numpy as np

    from pyspark.sql import types as T

    from aerovaldb_spark.functions import MEDIA_SCHEMA
    from aerovaldb_spark.functions.multimodal import (
        _wav_payload,
        parse_wav_pcm,
        resample_audio,
    )

    rng = np.random.default_rng(5)
    rows, srcs = [], {}
    for i, (rate, n) in enumerate([(16000, 1600), (8000, 800), (44100, 441)]):
        pcm = rng.integers(-32768, 32767, size=n, dtype=np.int16)
        srcs[i] = (rate, pcm)
        rows.append(
            (i, "audio", _wav_payload(rate, pcm.astype("<i2").tobytes()),
             None, None, 1000 * n // rate, "wav")
        )
    rows.append((98, "audio", b"MP3garbage", None, None, 100, "mp3"))
    # stereo fmt chunk: parses but unsupported -> quarantined
    stereo_fmt = (
        (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (16000).to_bytes(4, "little") + (64000).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    stereo = (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVEfmt "
        + len(stereo_fmt).to_bytes(4, "little") + stereo_fmt
        + b"data" + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00"
    )
    rows.append((99, "audio", stereo, None, None, 1, "wav"))
    rows.append((97, "audio", None, None, None, 1, "wav"))  # NULL payload
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in MEDIA_SCHEMA.fields]
    )
    media = spark.createDataFrame(rows, nullable)

    target = 4000
    out = {r["media_id"]: r for r in resample_audio(media, target).collect()}
    assert len(out) == 6
    assert out[98]["payload"] is None and out[98]["err"].startswith("error:")
    assert out[97]["payload"] is None and out[97]["err"].startswith("error:")
    assert out[99]["payload"] is None and "only mono 16-bit" in out[99]["err"]

    for i, (rate, pcm) in srcs.items():
        r = out[i]
        assert r["err"] is None and r["sample_rate"] == target
        got_rate, got_data = parse_wav_pcm(bytes(r["payload"]))
        assert got_rate == target
        got = np.frombuffer(got_data, dtype="<i2")
        n_out = max(1, (len(pcm) * target) // rate)
        idx = np.minimum((np.arange(n_out) * rate) // target, len(pcm) - 1)
        assert np.array_equal(got, pcm[idx]), i
        assert r["n_samples"] == n_out


def test_semantic_dup_gate_stream_matches_batch(spark):
    """Ingest-time SEMANTIC near-dup screen (q93's streaming twin):
    the stream run must flag exactly what the batch run flags, and the
    flags must equal independent qualifying-pair participation — a
    vector is a dup iff it has a same-bucket reference partner
    (excluding itself) with rounded cosine >= threshold."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        SEMANTIC_DEDUP_THRESHOLD,
        lsh_bucketed_pairs,
    )
    from aerovaldb_spark.streaming import (
        read_embedding_stream,
        run_stream_to_memory,
        semantic_dup_gate,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)  # frozen corpus = evens
    batch = semantic_dup_gate(emb, ref)
    stream = semantic_dup_gate(read_embedding_stream(spark, SF_DIR), ref)
    assert stream.isStreaming
    got = run_stream_to_memory(
        stream, "sem_dup_gate", spark, output_mode="append"
    )
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and len(a) == emb.count()

    # independent expectation: participation in a qualifying pair with
    # an EVEN partner, from the batch pair generator
    pairs = (
        lsh_bucketed_pairs(emb, 64)
        .filter(F.col("cosine") >= SEMANTIC_DEDUP_THRESHOLD)
        .collect()
    )
    want = set()
    for p in pairs:
        if p["id_b"] % 2 == 0:
            want.add(p["id_a"])
        if p["id_a"] % 2 == 0:
            want.add(p["id_b"])
    flagged = {r[0] for r in a if r[4]}
    assert flagged == want and want  # non-trivial at sf0.001

    # flagged rows carry their best match; unflagged sub-threshold or
    # isolated rows carry consistent match columns
    by_id = {r[0]: r for r in a}
    for v in flagged:
        assert by_id[v][2] >= SEMANTIC_DEDUP_THRESHOLD  # match_cosine
        assert by_id[v][3] % 2 == 0  # match_id from the reference


def test_semantic_dup_gate_accepts_srp_index_assignments(spark):
    """The frozen reference can be a persisted SRPIndex assignments
    table — same flags as gating against the raw vectors (the gate
    recomputes the bucket with its own hyperplanes, so the entry point
    is schema-agnostic)."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import SRPIndex
    from aerovaldb_spark.streaming import semantic_dup_gate

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = SRPIndex.build(emb, dim=64)
    via_index = sorted(
        map(tuple, semantic_dup_gate(emb, idx.assignments).collect())
    )
    via_raw = sorted(map(tuple, semantic_dup_gate(emb, emb).collect()))
    assert via_index == via_raw and len(via_raw) > 0


def test_bpe_pack_gate_stream_matches_batch(spark):
    """The stateful streaming packer equals batch q97 when the corpus
    arrives as one micro-batch (doc_id-sorted within batch), and its
    invariants hold regardless: shard totals bounded, shard ids
    contiguous per source, per-source token totals equal batch."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import BPE_PACK_BUDGET, bpe_pack
    from aerovaldb_spark.streaming import (
        bpe_pack_gate,
        read_document_stream,
        run_stream_to_memory,
    )

    docs = load_table(spark, SF_DIR, "documents")
    batch = sorted(map(tuple, bpe_pack_gate(docs).collect()))  # = q97
    assert batch == sorted(map(tuple, bpe_pack(docs).collect()))

    stream = bpe_pack_gate(read_document_stream(spark, SF_DIR))
    assert stream.isStreaming
    got = run_stream_to_memory(
        stream, "bpe_pack_gate", spark, output_mode="append"
    )
    streamed = sorted(map(tuple, got.collect()))
    assert streamed == batch and len(batch) > 0

    by_shard = {}
    for doc_id, source, n, shard in streamed:
        assert shard >= 0
        by_shard.setdefault((source, shard), []).append(n)
    for (source, shard), toks in by_shard.items():
        assert sum(toks) < BPE_PACK_BUDGET + max(toks)
    per_src = {}
    for source, shard in by_shard:
        per_src.setdefault(source, set()).add(shard)
    for source, shards in per_src.items():
        assert shards == set(range(len(shards)))


def test_tfidf_dup_gate_stream_matches_batch_q99(spark):
    """Ingest-time SPARSE near-dup screen (q99's streaming twin): the
    stream run must equal the batch run bit-for-bit, the flag set must
    equal q99 pair participation at the same threshold, and flagged
    rows must carry exactly q99's rank-1 neighbor (id and cosine)."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import tfidf_cosine_knn
    from aerovaldb_spark.streaming import (
        read_document_stream,
        run_stream_to_memory,
        tfidf_dup_gate,
        tfidf_reference_index,
    )

    docs = load_table(spark, SF_DIR, "documents")
    ix = tfidf_reference_index(docs, threshold=0.8)
    batch = tfidf_dup_gate(docs, ix)
    # map-only: no exchange anywhere in the gate's plan
    physical = batch._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in physical

    a = sorted(map(tuple, batch.collect()))
    assert len(a) == docs.count()  # exactly one row per doc

    stream = tfidf_dup_gate(read_document_stream(spark, SF_DIR), ix)
    assert stream.isStreaming
    got = run_stream_to_memory(
        stream, "tfidf_dup_gate", spark, output_mode="append"
    )
    assert sorted(map(tuple, got.collect())) == a

    # independent expectation from the batch self-join: a doc is a
    # dup iff it appears in q99's kNN graph (rank-1 edge exists at
    # the same threshold), and its match is the rank-1 neighbor
    knn = tfidf_cosine_knn(docs, threshold=0.8, max_neighbors=1).collect()
    rank1 = {r["doc_id"]: r for r in knn}
    flagged = {r[0] for r in a if r[3]}
    assert flagged == set(rank1) and flagged  # non-trivial corpus
    by_id = {r[0]: r for r in a}
    for d, r1 in rank1.items():
        assert by_id[d][1] == r1["neighbor_id"], d
        assert by_id[d][2] == r1["cosine"], d


def test_tfidf_dup_gate_oov_and_edge_docs(spark):
    """Documents outside the frozen vocabulary, empty documents, and
    exact duplicates of reference docs behave per the contract."""
    from aerovaldb_spark.streaming import (
        tfidf_dup_gate,
        tfidf_reference_index,
    )

    ref = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon eta"),
            (2, "omicron pi rho sigma tau upsilon"),
        ],
        ["doc_id", "text"],
    )
    ix = tfidf_reference_index(ref, threshold=0.7)
    incoming = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta"),  # = ref 0
            (101, "qqq www eee rrr"),  # fully OOV
            (102, ""),  # zero norm after idf weighting? (no: '' is a term)
            (0, "alpha beta gamma delta epsilon zeta"),  # self id excluded
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in tfidf_dup_gate(incoming, ix).collect()}
    assert out[100]["tfidf_dup"] and out[100]["match_id"] == 0
    # Exact duplicates score <= 1.0 by up to ~k*5e-7 for a k-term doc:
    # unit weights are round6'd BEFORE the dot (batch q99's scoring
    # convention, which the gate mirrors bit-for-bit), so the self-dot
    # is sum(round6(round6(w_t)^2)) — computable from the frozen index
    # itself. Assert THAT value, not 1.0.
    from decimal import Decimal

    from aerovaldb_spark._round import round6_py

    v0 = ix["vec"][0]
    expect = round6_py(
        float(sum(Decimal(repr(round6_py(x * x))) for x in v0.values()))
    )
    assert out[100]["match_cosine"] == expect
    assert 1.0 - 5e-6 <= expect <= 1.0 and expect >= ix["threshold"]
    # fully-OOV doc: nonzero norm, no candidates, unflagged
    assert not out[101]["tfidf_dup"] and out[101]["match_id"] is None
    # '' tokenizes to a single OOV empty-string term -> no candidates
    assert not out[102]["tfidf_dup"]
    # id 0 excludes its self-match; ref 1 (5/6 shared terms) sits at
    # cosine ~0.46 < 0.7, so the prefix filter correctly prunes it
    # (the bound is lossless only for pairs >= threshold)
    assert out[0]["match_id"] is None and not out[0]["tfidf_dup"]
    # at a threshold below that cosine, self-exclusion still
    # surfaces the near-dup reference
    lo = tfidf_reference_index(ref, threshold=0.4)
    out_lo = {
        r["doc_id"]: r for r in tfidf_dup_gate(incoming, lo).collect()
    }
    assert out_lo[0]["match_id"] == 1 and out_lo[0]["tfidf_dup"]


def test_tfidf_reference_index_guard_and_shards(spark):
    """The single-index builder refuses references over the broadcast
    budget (the SRPIndex planes>24 pattern); the sharded builder +
    combinator reproduce the unsharded gate bit-for-bit."""
    import pytest as _pytest

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        tfidf_dup_gate,
        tfidf_dup_gate_sharded,
        tfidf_reference_index,
        tfidf_reference_index_shards,
    )

    docs = load_table(spark, SF_DIR, "documents")
    with _pytest.raises(ValueError, match="broadcast budget"):
        tfidf_reference_index(docs, threshold=0.8, max_weights=10)
    with _pytest.raises(ValueError, match="per-shard budget"):
        tfidf_reference_index_shards(
            docs, threshold=0.8, n_shards=2, max_weights=10
        )

    ix = tfidf_reference_index(docs, threshold=0.8)
    for n_shards in (1, 3):
        shards = tfidf_reference_index_shards(
            docs, threshold=0.8, n_shards=n_shards
        )
        # corpus-global stats are shared, vectors partitioned exactly
        assert all(s["idf"] == ix["idf"] for s in shards)
        merged: dict = {}
        for s in shards:
            assert not (set(merged) & set(s["vec"]))
            merged.update(s["vec"])
        assert merged == ix["vec"]
        a = sorted(map(tuple, tfidf_dup_gate(docs, ix).collect()))
        b = sorted(
            map(tuple, tfidf_dup_gate_sharded(docs, shards).collect())
        )
        assert a == b and len(a) == docs.count()

    # the sharded path runs on a stream: each per-shard gate is the
    # same stateless map-only plan — stream == batch for a shard pass
    from aerovaldb_spark.streaming import (
        read_document_stream,
        run_stream_to_memory,
    )

    shards = tfidf_reference_index_shards(docs, threshold=0.8, n_shards=3)
    batch_shard = sorted(
        map(tuple, tfidf_dup_gate(docs, shards[1]).collect())
    )
    got = run_stream_to_memory(
        tfidf_dup_gate(read_document_stream(spark, SF_DIR), shards[1]),
        "tfidf_dup_gate_shard",
        spark,
        output_mode="append",
    )
    assert sorted(map(tuple, got.collect())) == batch_shard


def test_tfidf_screen_join_matches_gate(spark):
    """The fully join-based screen (no driver-side reference state)
    must equal the broadcast gate bit-for-bit on the same inputs —
    including OOV docs, overlapping ids, and exact duplicates."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import tfidf_screen_join
    from aerovaldb_spark.streaming import (
        tfidf_dup_gate,
        tfidf_reference_index,
    )

    docs = load_table(spark, SF_DIR, "documents")
    ix = tfidf_reference_index(docs, threshold=0.8)
    a = sorted(map(tuple, tfidf_dup_gate(docs, ix).collect()))
    b = sorted(map(tuple, tfidf_screen_join(docs, docs, 0.8).collect()))
    assert a == b and len(a) == docs.count()

    # distinct incoming corpus with OOV + exact-dup + overlapping ids
    incoming = spark.createDataFrame(
        [r for r in [
            (0, docs.where("doc_id = 0").collect()[0]["text"]),
            (7777, docs.where("doc_id = 1").collect()[0]["text"]),
            (8888, "zzz www qqq"),
        ]],
        ["doc_id", "text"],
    )
    a2 = sorted(map(tuple, tfidf_dup_gate(incoming, ix).collect()))
    b2 = sorted(
        map(tuple, tfidf_screen_join(incoming, docs, 0.8).collect())
    )
    assert a2 == b2 and len(a2) == 3


def test_stream_stream_left_outer_plan_and_fallthrough(spark):
    """q107's streaming twin: genuine left-outer stream-stream join in
    the logical plan (LeftOuter + both sides watermarked) and exact
    batch fallthrough. Full stream == batch equivalence (including the
    watermark-deferred NULL-click emissions) is asserted in
    tests/test_multibatch_streaming.py with a watermark-advancing
    sentinel batch."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.events import purchase_click_pairs_outer
    from aerovaldb_spark.streaming import (
        read_event_stream,
        stream_purchase_click_pairs_outer,
    )

    ev = load_table(spark, SF_DIR, "events")
    batch = sorted(map(tuple, purchase_click_pairs_outer(ev).collect()))
    assert any(t[1] is None for t in batch)  # unmatched purchases exist

    stream = stream_purchase_click_pairs_outer(read_event_stream(spark, SF_DIR))
    assert stream.isStreaming
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "Join LeftOuter" in plan and plan.count("EventTimeWatermark") == 2

    assert sorted(
        map(tuple, stream_purchase_click_pairs_outer(ev).collect())
    ) == batch


def test_stream_stream_purchase_click_join(spark):
    """The watermarked STREAM-STREAM join (q104's twin) equals the
    batch bounded-lookback pair join bit-for-bit, runs as a genuine
    two-stream stateful join (StreamingSymmetricHashJoin in the
    executed plan), and its pairs reduce to q18's as-of answer for
    purchases whose latest click falls inside the lookback."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.events import purchase_click_pairs
    from aerovaldb_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        stream_purchase_click_pairs,
    )

    ev = load_table(spark, SF_DIR, "events")
    batch = sorted(map(tuple, purchase_click_pairs(ev).collect()))
    assert batch  # non-trivial corpus

    stream = stream_purchase_click_pairs(read_event_stream(spark, SF_DIR))
    assert stream.isStreaming
    got = run_stream_to_memory(
        stream, "pc_pairs", spark, output_mode="append"
    )
    streamed = sorted(map(tuple, got.collect()))
    assert streamed == batch

    # the streaming twin falls through to the exact batch operator
    assert sorted(
        map(tuple, stream_purchase_click_pairs(ev).collect())
    ) == batch

    # genuine stream-stream join: symmetric hash join in the plan
    plan = stream._jdf.queryExecution().analyzed().toString()
    # analyzed plan of a streaming DF shows the join; the physical
    # streaming node only exists inside a started query, so assert on
    # the logical join + both watermarks instead
    assert "Join Inner" in plan and plan.count("EventTimeWatermark") == 2

    # pairs reduce to q18's as-of: per purchase, max click_ts == the
    # as-of click when that click is within the lookback
    from aerovaldb_spark.operators.events import q18_asof_purchase_click

    asof = {
        r["event_id"]: r["last_click_ts"]
        for r in q18_asof_purchase_click(spark, SF_DIR).collect()
    }
    best: dict = {}
    for pid, _cid, _uid, _pts, cts in streamed:
        best[pid] = max(best.get(pid, ""), cts)
    for pid, cts in best.items():
        assert asof[pid] == cts, pid


def test_near_dup_screen_join_matches_broadcast_gate(spark):
    """The shuffled join-based minhash screen (for over-broadcast
    references) is bit-identical to the per-band broadcast gate, and
    its plan carries no broadcast of the reference side."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        near_dup_gate,
        near_dup_screen_join,
        reference_band_buckets,
    )

    docs = load_table(spark, SF_DIR, "documents")
    ref = reference_band_buckets(docs)
    a = sorted(
        map(tuple, near_dup_gate(docs, ref).collect())
    )
    b = sorted(
        map(tuple, near_dup_screen_join(docs, ref).collect())
    )
    assert a == b and len(a) == docs.count()
    assert any(r[-1] for r in b)  # self-screen flags everything real


def test_tfidf_screen_sub_threshold_best_is_null(spark):
    """Regression (r7 review finding): a doc whose best SUB-threshold
    match shares no prefix term must report NULL match columns — the
    contract reports a match only when it made the doc a duplicate,
    which is what keeps the all-pairs oracle exact. Corpus shape: two
    docs dominated by unique heavy terms whose only overlap with the
    rest is low-weight tail vocabulary."""
    import duckdb

    from aerovaldb_spark.operators.text import (
        Q102_SQL,
        tfidf_screen_join,
    )
    from aerovaldb_spark.streaming import (
        tfidf_dup_gate,
        tfidf_reference_index,
    )

    common = " ".join(f"c{j}" for j in range(20))
    rows = [
        (1, ("uniqa " * 10) + common),
        (2, ("uniqb " * 10) + common),
        # identical pair with its own vocabulary -> flagged
        (3, "dupword dupword dupword"),
        (4, "dupword dupword dupword"),
    ] + [
        # tail-vocabulary docs: df(c_j) < n so the c-terms carry
        # nonzero weight, giving docs 1/2 a real sub-threshold best
        (i, common)
        for i in range(5, 9)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    screen = {
        r["doc_id"]: r
        for r in tfidf_screen_join(docs, docs, 0.8).collect()
    }
    # doc 1's best match (a sub-threshold tail-overlap) is NOT
    # reported; docs 3-8 are identical -> flagged with a real match
    assert screen[1]["match_id"] is None and not screen[1]["tfidf_dup"]
    assert screen[3]["tfidf_dup"] and screen[3]["match_id"] == 4

    # gate mirrors the screen bit-for-bit on the same corpus
    gate = {
        r["doc_id"]: r
        for r in tfidf_dup_gate(
            docs, tfidf_reference_index(docs, threshold=0.8)
        ).collect()
    }
    assert sorted(map(tuple, gate.values())) == sorted(
        map(tuple, screen.values())
    )

    # and the all-pairs oracle agrees exactly
    import pandas as pd  # noqa: F401

    con = duckdb.connect()
    try:
        pdf = docs.toPandas()
        con.register("documents", pdf)
        oracle = {
            r[0]: r for r in con.execute(Q102_SQL).fetchall()
        }
    finally:
        con.close()
    for d, r in screen.items():
        o = oracle[d]
        assert (r["match_id"], r["match_cosine"], r["tfidf_dup"]) == (
            o[1],
            o[2],
            o[3],
        ), d


def test_near_dup_bucket_index_lifecycle(spark, tmp_path):
    """The minhash screen family's persisted index: build/save/load
    screens bit-equal to the direct join; add() appends only the new
    docs' buckets (zero staleness — equals a rebuild over the union);
    compact() reclaims append duplicates with identical screening;
    load refuses nothing here (dial matches) but the meta pin exists."""
    import os

    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        NearDupBucketIndex,
        near_dup_screen_join,
        reference_band_buckets,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    ref = docs.where("doc_id % 4 = 0")
    new = docs.where("doc_id % 4 = 2")
    probes = docs.where("doc_id % 2 = 1")

    def flags(df):
        return {r["doc_id"]: r["near_dup"] for r in df.collect()}

    want = flags(near_dup_screen_join(probes, reference_band_buckets(ref)))
    p = str(tmp_path / "nd_idx")
    NearDupBucketIndex.build(ref).save(p)
    loaded = NearDupBucketIndex.load(spark, p)
    assert flags(loaded.screen(probes)) == want

    grown = loaded.add(new, path=p)
    want_grown = flags(
        near_dup_screen_join(
            probes, reference_band_buckets(ref.unionByName(new))
        )
    )
    assert flags(grown.screen(probes)) == want_grown
    # growth is monotone and the appended docs matter
    assert {d for d, f in want.items() if f} <= {
        d for d, f in want_grown.items() if f
    }
    assert want != want_grown

    # append duplicates exist on disk; compact reclaims them without
    # changing the screen
    n_rows_before = spark.read.parquet(os.path.join(p, "buckets")).count()
    NearDupBucketIndex.load(spark, p).add(new, path=p)  # duplicate batch
    assert (
        spark.read.parquet(os.path.join(p, "buckets")).count()
        > n_rows_before
    )
    compacted = NearDupBucketIndex.compact(spark, p)
    assert (
        spark.read.parquet(os.path.join(p, "buckets")).count()
        <= n_rows_before
    )
    assert flags(compacted.screen(probes)) == want_grown
