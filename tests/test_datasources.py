"""Custom Python DataSource tests (datasources.py)."""

from __future__ import annotations

from aws_medallion_etl_spark import datasources


def test_synthetic_docs_partitioned_and_deterministic(spark):
    datasources.register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 37)
        .option("num_partitions", 3)
        .load()
    )
    rows = sorted((r.doc_id, r.text, r.n_chars) for r in df.collect())
    assert len(rows) == 37
    assert rows[0] == (0, "w0 w3 w6 w9 w12", 15)
    # every row reproducible from the pure function
    for doc_id, text, n_chars in rows:
        assert text == datasources._doc_text(doc_id)
        assert n_chars == len(text)
    # re-read yields the identical relation (no per-run state)
    again = sorted(
        (r.doc_id, r.text, r.n_chars)
        for r in spark.read.format("synthetic_docs")
        .option("n_docs", 37).option("num_partitions", 5).load().collect()
    )
    assert again == rows  # partition count must not change content


def test_synthetic_docs_ceil_partitioning():
    # 10 docs over 4 partitions -> ranges cover exactly [0, 10)
    r = datasources.SyntheticDocsReader({"n_docs": 10, "num_partitions": 4})
    spans = [(p.start, p.end) for p in r.partitions()]
    covered = sorted(x for s, e in spans for x in range(s, e))
    assert covered == list(range(10))


def test_synthetic_docs_empty_relation(spark):
    datasources.register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 0)
        .load()
    )
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "text", "n_chars"]
