"""The bench-session feed snapshot must be indistinguishable from the
directly built feed (change_feed() transparently serves the parquet
snapshot after materialize_feeds())."""

from tests.conftest import SF_SMOKE


def test_materialized_feed_equals_built(spark, tmp_path):
    from oracdc_spark import feed

    feed.clear_feed_cache()
    try:
        built = feed._build_change_feed(spark, SF_SMOKE, with_customer=True)
        built_rows = sorted(map(tuple, built.collect()))
        feed.materialize_feeds(spark, SF_SMOKE, str(tmp_path))
        cached = feed.change_feed(spark, SF_SMOKE, with_customer=True)
        assert cached.columns == built.columns
        assert sorted(map(tuple, cached.collect())) == built_rows
    finally:
        feed.clear_feed_cache()


def test_cache_key_is_per_sf_dir(spark, tmp_path):
    from oracdc_spark import feed

    feed.clear_feed_cache()
    try:
        feed.materialize_feeds(spark, SF_SMOKE, str(tmp_path))
        # a different sf_dir must NOT hit the snapshot
        other = feed.change_feed(spark, "/root/testdata/sf0.01")
        assert "parquet" not in other.inputFiles()[0] or all(
            str(tmp_path) not in f for f in other.inputFiles()
        )
    finally:
        feed.clear_feed_cache()
