"""Unit tests for library-level text ops that are not graded queries
(the synthetic corpus has no PII-shaped content, so these semantics
are pinned on constructed rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aerovaldb_spark.operators.text import pii_columns, redact_pii


def _docs(spark):
    rows = [
        (0, "contact me at alice@example.com or bob.smith+x@mail.co today"),
        (1, "server 10.0.0.1 talked to 192.168.1.254 over tls"),
        (2, "call 555-867-5309 or 555.123.4567 now"),
        (3, "no personal data in this row at all"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_columns_counts(spark):
    out = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in pii_columns(_docs(spark)).collect()
    }
    assert out[0] == (2, 0, 0)
    assert out[1] == (0, 2, 0)
    assert out[2] == (0, 0, 2)
    assert out[3] == (0, 0, 0)
    assert out[4] == (0, 0, 0)


def test_redact_pii_replaces_every_match(spark):
    red = redact_pii(_docs(spark))
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert texts[0] == "contact me at <PII> or <PII> today"
    assert texts[1] == "server <PII> talked to <PII> over tls"
    assert texts[2] == "call <PII> or <PII> now"
    assert texts[3] == "no personal data in this row at all"
    # redacted output carries no residual PII
    residual = pii_columns(red).agg(
        F.sum(F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
    ).collect()[0][0]
    assert residual == 0


def test_redact_pii_custom_replacement_and_column(spark):
    df = spark.createDataFrame([(1, "x@y.io wrote")], ["id", "body"])
    out = redact_pii(df, text_col="body", replacement="[gone]").collect()[0]
    assert out["body"] == "[gone] wrote"
