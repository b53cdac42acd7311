#!/usr/bin/env bash
# Round-8 decade rehearsals (run after tools/sweep_sf10.sh so the JVMs
# don't contend):
#   1. embeddings-only sf1e/sf10e/sf100e dirs (20k / 200k / 2M vectors
#      -- the round-7 decade dirs regenerated, since the planted-offset
#      fix changes the construction at sf10+)
#   2. PqLifecycle: append repair (frozen-books delta) vs full re-derive
#   3. QueryProbe decades for the two ops whose round-7 numbers were
#      measured on the corrupted planted construction
#      (c2_dedup_semantic, c2_dedup_cosine_lsh)
set -euo pipefail
cd "$(dirname "$0")/.."

ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
RUN="java -Xmx96g $ADDOPENS -cp target/scala-2.13/classes:/opt/spark/jars/*"

[ -d /tmp/graft_sf1e/embeddings.parquet ] || \
  SPARK_GRAFT_CPUS=16 $RUN graft.tools.MakeScale /root/testdata/sf0.1 /tmp/graft_sf1e 10 documents,embeddings 10
[ -d /tmp/graft_sf10e/embeddings.parquet ] || \
  SPARK_GRAFT_CPUS=16 $RUN graft.tools.MakeScale /root/testdata/sf0.1 /tmp/graft_sf10e 100 documents,embeddings 10
[ -d /tmp/graft_sf100e/embeddings.parquet ] || \
  SPARK_GRAFT_CPUS=16 $RUN graft.tools.MakeScale /tmp/graft_sf10e /tmp/graft_sf100e 10 documents,embeddings 1

echo "== PqLifecycle (append repair vs full re-derive) =="
$RUN graft.tools.PqLifecycle /tmp/graft_sf10e /tmp/graft_sf100e

echo "== c2_dedup_semantic decades (fixed planted offset) =="
$RUN graft.tools.QueryProbe c2_dedup_semantic /tmp/graft_sf1e /tmp/graft_sf10e /tmp/graft_sf100e

echo "== c2_dedup_cosine_lsh decades (fixed planted offset) =="
$RUN graft.tools.QueryProbe c2_dedup_cosine_lsh /tmp/graft_sf1e /tmp/graft_sf10e /tmp/graft_sf100e
