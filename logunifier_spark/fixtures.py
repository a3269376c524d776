"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Generated entirely with native Spark expressions from `spark.range` — no
driver-side data, no external files, reproducible at any scale (pure function
of the row index), so the same generator serves 1k-row unit tests and the
multi-million-row bench/scaling runs.

Skew: conversations whose sequential id ends in 00 (1%) receive ~30× the
turns of a normal conversation, concentrating ~30% of all rows in 1% of
conv_ids — the hot-conversation shape the salted router must spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# golden log lines drawn from the reference's unit-test corpus
# (pkg/patterns/patternutils_test.go, pkg/utils/logfmtutils_test.go) —
# cycled per pattern family so every format keeps appearing at scale
GOLDEN_LINES: list[tuple[str, str]] = [
    ("tslevelmsg", "2023-03-20T15:06:45.057Z [DEBUG] nomad: memberlist: Stream connection from=127.0.0.1:48046"),
    ("tslevelmsg", "2023-03-19 21:17:04,243+0000 INFO [FelixStartLevel] bundle org.apache.felix.scr:2.1.30 (54) Starting"),
    ("tslevelmsg", "[1] 2023/03/20 14:27:52.652648 [INF] Server is ready"),
    ("tslevelmsg", "2023-03-29 20:50:13.931 [INF] Server is ready"),
    ("tslevelmsg", "2025-02-12T17:16:50.575363Z WRN Processor EcsLogChannel Nothing received after 10s"),
    ("tslevelmsg", "Invalid message"),
    ("envoy", "[2023-03-30 10:51:43.705][42][debug][upstream] [source/common/upstream/upstream_impl.cc:451] transport socket match"),
    ("envoy", "[2023-03-30 10:51:43.705][7][warning][config] [source/server/config.cc:91] gRPC config stream closed"),
    ("traefik", "2024-12-19T18:22:09Z DBG github.com/traefik/traefik/v3/pkg/provider/consulcatalog/consul_catalog.go:287 > Filtering disabled item providerName=consulcatalog"),
    ("traefik", "2024-12-19T18:22:10Z INF github.com/traefik/traefik/v3/pkg/server/router.go:102 > Router up routerName=web"),
    ("logfmt", 'ts=2023-03-10T18:53:52.739622365Z caller=health.go:87 level=error msg="error collecting stats for unit" err="permission denied"'),
    ("logfmt", 'logger=live t=2023-03-16T20:43:56.936517913Z level=info msg="Initialized channel handler" channel=grafana path=grafana'),
    ("logfmt", "a=1 b=2 c=3"),
    ("logfmt", "you got it a=1 b= "),
    ("logfmt", 'level=info msg="request done" traceID=6a3b2f1c user=svc-account duration=12ms'),
    ("nop", "plain unstructured container output line"),
    ("nop", "another raw line with no structure at all"),
    ("ecs", '{"@timestamp":"2023-06-07T13:08:51+01:00","message":"native ecs entry","log":{"level":"INFO","logger":"app"},"service":{"name":"shop","version":"1.2.3","type":"web","stack":"prod","namespace":"retail"},"host":{"name":"node1","hostname":"node1"},"organization":{"name":"acme"},"environment":{"name":"prod"}}'),
    ("ecs", '{"@timestamp":"2022-08-04T09:53:59.620557561Z","message":"trace ping","log":{"level":"debug"},"trace":{"trace":{"id":"t-123"},"span":{"id":"s-9"}}}'),
    ("ecs", "this is not valid ecs json {"),
]

ROLES = ["user", "assistant", "tool", "system"]
BASE_TS = "2024-01-01 00:00:00"


def synth_transcripts(spark: SparkSession, n_rows: int,
                      turns_per_conv: int = 20,
                      hot_factor: int = 30,
                      num_partitions: int | None = None) -> DataFrame:
    """n_rows transcript turns; deterministic pure function of the row id.

    `num_partitions` births the range with that partitioning — generation
    then fuses into the consumer's first stage with NO shuffle (a
    repartition() after the projection would shuffle the full synthesized
    text, ~200 B/row)."""
    rng = (spark.range(0, n_rows, numPartitions=num_partitions)
           if num_partitions else spark.range(n_rows))
    df = rng.withColumnRenamed("id", "row_id")

    # conversation assignment with skew: a "slot" is hot when slot % 100 == 0;
    # hot slots absorb hot_factor consecutive normal-sized blocks of turns.
    block = F.floor(F.col("row_id") / turns_per_conv)
    hot_block = F.floor(block / hot_factor) * F.lit(hot_factor)
    is_hot_region = (F.pmod(hot_block, 100) == 0)
    conv_seq = F.when(is_hot_region, hot_block).otherwise(block)

    line_map_args = []
    for i, (tool, line) in enumerate(GOLDEN_LINES):
        line_map_args += [F.lit(i), F.struct(F.lit(tool).alias("tool"),
                                             F.lit(line).alias("line"))]
    line_map = F.create_map(*line_map_args)
    pick = F.element_at(line_map, F.pmod(F.col("row_id"), len(GOLDEN_LINES)).cast("int"))

    role_map = F.create_map(*[F.lit(x) for i, r in enumerate(ROLES) for x in (i, r)])

    # turn_idx by pure arithmetic (row offset from the conversation's first
    # row) — no window/shuffle, so generation scales linearly with n_rows
    conv_start_row = conv_seq * turns_per_conv
    turn_idx = (F.col("row_id") - conv_start_row).cast("int")

    return df.select(
        F.format_string("conv%08d", conv_seq).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.element_at(role_map, F.pmod(F.col("row_id"), 4).cast("int")).alias("role"),
        pick["line"].alias("text"),
        pick["tool"].alias("tool"),
        (F.to_timestamp(F.lit(BASE_TS)) +
         F.make_dt_interval(secs=F.col("row_id").cast("double"))).alias("ts"),
    )
