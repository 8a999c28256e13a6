"""K1 writer binding shape (broker-free)."""

import pytest

import json

import pyspark.sql.functions as F

from oracdc_spark.feed import change_feed
from oracdc_spark.operators.cdc import commit_stamped
from oracdc_spark.sinks.kafka import bind_kafka_records

SF = "/root/testdata/sf0.001"


def test_kafka_binding_shape_and_tombstones(spark):
    stamped = commit_stamped(change_feed(spark, SF))
    bound = bind_kafka_records(stamped)
    assert [f.name for f in bound.schema.fields] == ["topic", "key", "value", "headers"]
    assert dict(bound.dtypes)["headers"] == "array<struct<key:string,value:binary>>"

    rows = bound.collect()
    assert all(r.topic == "SCOTT_ORDERS" for r in rows)
    dels = [r for r in rows if bytes(r.headers[0].value) == b"d"]
    assert dels and all(r.value is None for r in dels)  # tombstones
    ups = [r for r in rows if bytes(r.headers[0].value) == b"c"]
    payload = json.loads(bytes(ups[0].value))
    assert {"pk", "totalprice", "status", "__scn", "__commit_scn"} <= set(payload)
    key = json.loads(bytes(ups[0].key))
    assert key["pk"] == payload["pk"]


def test_kafka_custom_topic_mapper(spark):
    from oracdc_spark.transforms import flexible_topic_mapper

    stamped = commit_stamped(change_feed(spark, SF))
    bound = bind_kafka_records(stamped, flexible_topic_mapper("%OWNER%.%TABLE%.v1"))
    assert bound.select("topic").distinct().collect()[0].topic == "SCOTT.ORDERS.v1"


def test_kafka_headers_carry_commit_scn(spark):
    stamped = commit_stamped(change_feed(spark, SF))
    r = bind_kafka_records(stamped).first()
    hdrs = {h.key: bytes(h.value) for h in r.headers}
    assert set(hdrs) == {"op", "commit_scn"}
    assert hdrs["commit_scn"].isdigit()


@pytest.mark.slow
def test_topic_partition_pinned(spark):
    """a2.topic.partition pins every record to one partition
    (KafkaSourceConnectorConfig.java:90,1027)."""
    from oracdc_spark.connector import OraCdcConnector

    c = OraCdcConnector({"a2.topic.partition": "3", "a2.tolerate.incomplete.row": "true"})
    recs = c.kafka_records(spark, "/root/testdata/sf0.001")
    assert "partition" in recs.columns
    vals = recs.select("partition").distinct().collect()
    assert [v[0] for v in vals] == [3]
    # unconfigured: no partition column (writer falls back to key hashing)
    c2 = OraCdcConnector({"a2.tolerate.incomplete.row": "true"})
    assert "partition" not in c2.kafka_records(spark, "/root/testdata/sf0.001").columns
