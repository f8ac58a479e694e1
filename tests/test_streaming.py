"""Structured Streaming surfaces: crawl-result micro-batch ingestion
(exactly-once resume) and watermarked windowed aggregation."""

from pyspark.sql import functions as F

from dude_spark.api import Scraper
from dude_spark.corpus import pages_df, robots_df, seeds
from dude_spark.crawl import CrawlConfig, CrawlJob
from dude_spark.streaming import stream_crawl_results, windowed_event_counts

SF = "/root/testdata/sf0.001"


def test_stream_crawl_results_exactly_once(spark, tmp_path):
    app = Scraper()

    @app.select(css=".title", group_css=".custom-group")
    def t(element):
        return {"t": element.text_content()}

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    pages = pages_df(spark, SF).select("url", "html")
    job = CrawlJob(
        spark, app, pages, robots=robots_df(spark),
        config=CrawlConfig(max_rounds=3, round_seconds=3600, state_dir=state),
    )
    job.run(seeds()[:6])

    n_batches = stream_crawl_results(spark, state, out)
    assert n_batches >= 1
    streamed = spark.read.parquet(out)
    batch = spark.read.parquet(state + "/extracted").filter(F.col("kind") == "data")
    assert streamed.count() == batch.count()

    # draining again ingests NOTHING new (stream checkpoint = exactly-once)
    stream_crawl_results(spark, state, out)
    assert spark.read.parquet(out).count() == batch.count()


def test_windowed_event_counts_matches_batch(spark):
    res = windowed_event_counts(
        spark, "/root/testdata/sf0.001/events.parquet", sink_table="ew_test"
    )
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            (F.col("user_id") % 10).alias("user_bucket"),
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select("user_bucket", F.col("w.start").cast("long").alias("window_start"),
                "n_events", "total_value")
    )
    got = {(r["user_bucket"], r["window_start"]): (r["n_events"], r["total_value"])
           for r in res.collect()}
    want = {(r["user_bucket"], r["window_start"]): (r["n_events"], r["total_value"])
            for r in batch.collect()}
    assert got == want
