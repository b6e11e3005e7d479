"""Python DataSource API generator: registered-by-name, deterministic
across partitionings, reference null distributions."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pytest
from pyspark.sql import functions as F

from flink_application_spark.sources import pyds


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pyds.register(spark)


def _load(spark, **opts):
    r = spark.read.format("cdrgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_count_and_determinism(spark):
    df = _load(spark, n=2000, seed=7, numPartitions=8)
    assert df.count() == 2000
    assert [f.name for f in df.schema.fields] == [
        "start_time", "measuring_probe_name", "imsi", "msisdn",
        "ms_ip_address", "unique_cdr_id",
    ]
    # partitioning must not change the generated multiset
    again = _load(spark, n=2000, seed=7, numPartitions=3)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again.collect()))


def test_null_distributions_and_domains(spark):
    df = _load(spark, n=5000, seed=1).cache()
    n = df.count()
    imsi_rate = df.filter(F.col("imsi").isNotNull()).count() / n
    msisdn_rate = df.filter(F.col("msisdn").isNotNull()).count() / n
    # generator operating points: 0.5 / 0.1 (flink.conf:9-10)
    assert abs(imsi_rate - 0.5) < 0.05
    assert abs(msisdn_rate - 0.1) < 0.03
    # ip wrapped in ';' (CsvData.java:145-147); probes from the 15-code list
    bad = df.filter(~F.col("ms_ip_address").rlike(r"^;.*;$")).count()
    assert bad == 0
    probes = {r[0] for r in df.select(F.substring("measuring_probe_name", 1, 2)).distinct().collect()}
    assert probes <= set(pyds.PROBES)
    df.unpersist()


def test_stream_reader_matches_batch_rows(spark, tmp_path):
    """The streaming source drains `maxrows` rows across micro-batches
    and the union equals the batch reader's rows exactly (offset
    ranges ARE row-index ranges; md5 rows make replay bit-identical)."""
    import time

    from flink_application_spark.sources import pyds

    pyds.register(spark)
    stream = (
        spark.readStream.format("cdrgen")
        .option("rowsPerBatch", 40)
        .option("maxRows", 100)
        .option("seed", 7)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdrgen_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table("cdrgen_stream").count() >= 100:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)

    got = spark.table("cdrgen_stream")
    want = (
        spark.read.format("cdrgen").option("n", 100).option("seed", 7).load()
    )
    assert got.count() == 100
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
