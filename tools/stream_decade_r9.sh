#!/usr/bin/env bash
# Round-9 streaming-leg decade runs (VERDICT item 5):
#   1. c22d (store-backed near-dup stream) at sf10 docs (500k) — with the
#      in-stream compaction cadence on; per-micro-batch costs land as
#      [stream-batch] lines; pair parity asserted against the batch c27
#      path on the SAME dir (both emit the store's complete pair set).
#   2. c22c (streaming semantic dedup) at sf100e (2M vectors) — the
#      embeddings family's missing top decade.
# Run AFTER other JVMs are quiet (timing claims).
set -euo pipefail
cd "$(dirname "$0")/.."

ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
RUN="java -Xmx96g $ADDOPENS -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "== c22d decade at sf10 docs (cadence on) =="
SPARK_GRAFT_CONF=graft.stream.compactMaxFiles=64 \
  $RUN graft.tools.QueryProbe c22d_dedup_stream_store /tmp/graft_sf10e

echo "== c22d pair parity vs batch c27 at sf10 (Spark-to-Spark) =="
SPARK_GRAFT_ONLY=c22d_dedup_stream_store,c27_dedup_incremental \
SPARK_GRAFT_QUERY_TIMEOUT=3600 \
  $RUN graft.Verify /tmp/graft_sf10e /tmp/graft_stream_parity_sf10
python3 - <<'EOF'
import duckdb
a = "/tmp/graft_stream_parity_sf10/c22d_dedup_stream_store/*.parquet"
b = "/tmp/graft_stream_parity_sf10/c27_dedup_incremental/*.parquet"
n = duckdb.sql(f"SELECT (SELECT count(*) FROM '{a}'), (SELECT count(*) FROM '{b}')").fetchone()
d = duckdb.sql(f"SELECT count(*) FROM ((SELECT * FROM '{a}' EXCEPT SELECT * FROM '{b}') UNION ALL (SELECT * FROM '{b}' EXCEPT SELECT * FROM '{a}'))").fetchone()[0]
print(f"c22d rows={n[0]} c27 rows={n[1]} symmetric_diff={d}")
assert d == 0 and n[0] == n[1], "stream/batch pair sets diverge at sf10"
print("PARITY OK")
EOF

echo "== c22c decade at sf100e (2M vectors, cadence on) =="
SPARK_GRAFT_CONF=graft.stream.compactMaxFiles=64 \
  $RUN graft.tools.QueryProbe c22c_dedup_semantic_stream /tmp/graft_sf100e
