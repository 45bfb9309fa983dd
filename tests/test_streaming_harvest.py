"""Continuous KG construction: the harvest family is stateless
zero-shuffle projections (plus a distinct the streaming variant swaps
for per-batch semantics), so the SAME functions run unchanged under
Structured Streaming — the streamed result over file-batched pages must
equal the batch run over the same files. This is the north rule's
crawl-ingest shape: new WARC drops land as files, triples append."""

from pyspark.sql import functions as F


def _write_pages(spark, tmp_path):
    rows = [
        (
            "u1",
            '<nav class="breadcrumb"><a>Home</a><a>Phones</a></nav>'
            "<p>fruits such as apples, pears and quinces.</p>",
        ),
        (
            "u2",
            '<div class="breadcrumb"><a>Home</a><a>Laptops</a></div>'
            "<p>paris, the capital of france.</p>",
        ),
        ("u3", "<p>no structure at all</p>"),
    ]
    d = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html string").coalesce(
        1
    ).write.parquet(d)
    return d


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def test_breadcrumb_harvest_streams_and_matches_batch(spark, tmp_path):
    from ontoweaver_spark.webdoc import breadcrumb_trails

    d = _write_pages(spark, tmp_path)
    schema = "url string, html string"
    batch = {
        tuple(r)
        for r in breadcrumb_trails(spark.read.schema(schema).parquet(d))
        .collect()
    }
    streamed = breadcrumb_trails(spark.readStream.schema(schema).parquet(d))
    assert streamed.isStreaming
    _run_stream(streamed, "bc_stream")
    got = {tuple(r) for r in spark.sql("SELECT * FROM bc_stream").collect()}
    assert got == batch == {
        ("u1", "Phones", "Home", 2),
        ("u2", "Laptops", "Home", 2),
    }


def test_sentence_harvest_streams_and_matches_batch(spark, tmp_path):
    from ontoweaver_spark.webdoc import (
        appositive_relations, hearst_hypernyms, html_to_text,
    )

    d = _write_pages(spark, tmp_path)
    schema = "url string, html string"

    def harvest(df):
        docs = df.select(
            F.col("url").alias("doc_id"),
            html_to_text(F.col("html")).alias("text"),
        )
        isa = hearst_hypernyms(docs, id_col="doc_id").select(
            "doc_id", F.col("hyponym").alias("s"),
            F.lit("is_a").alias("p"), F.col("hypernym").alias("o"),
        )
        rel = appositive_relations(docs, id_col="doc_id").select(
            "doc_id", F.col("subject").alias("s"),
            F.col("relation").alias("p"), F.col("object").alias("o"),
        )
        return isa.unionByName(rel)

    batch = {tuple(r) for r in harvest(spark.read.schema(schema).parquet(d)).collect()}
    streamed = harvest(spark.readStream.schema(schema).parquet(d))
    assert streamed.isStreaming
    _run_stream(streamed, "kg_stream")
    got = {tuple(r) for r in spark.sql("SELECT * FROM kg_stream").collect()}
    assert got == batch
    assert ("u2", "paris", "capital", "france") in got
    assert ("u1", "apples", "is_a", "fruits") in got
