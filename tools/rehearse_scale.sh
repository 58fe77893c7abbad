#!/bin/bash
# Two-decade scale rehearsal: run each headliner query STANDALONE (fresh
# JVM, quiet box) at sf0.1 / sf1 / sf10 and append one JSON line per run
# to the log. Usage: tools/rehearse_scale.sh <outfile> [query ...]
set -u
OUT="$1"; shift
QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(q_dedup_ngram q_dedup_minhash q_fuzzy_join q_fuzzy_join_qgram \
    q_similarity_ivf q_similarity_ivf_persisted q_pagerank q_bucketed_join \
    q_zorder_scan q_hilbert_scan q_call_maintenance q_compact_expire \
    q_clustered_compact_scan q_dedup_canonical q_constraint_sql \
    q_groupby_pushdown q_mv_rewrite_sum q_mv_rewrite_filtered q_stream_changes)
fi
cd /tmp   # graft.Bench overwrites bench_detail.json in cwd
for sf in /root/testdata/sf0.1 /root/repo/target/sfgen/sf1 /root/repo/target/sfgen/sf10; do
  for q in "${QUERIES[@]}"; do
    line=$(SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_SF_DIR="$sf" \
      java -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
      "-Xmx${GRAFT_XMX:-48g}" graft.Bench 2>/dev/null | grep '"metric"'; \
      exit "${PIPESTATUS[0]}")
    rc=$?   # the JVM's exit status, not grep's — a dead JVM must log as such
    if [ -z "$line" ]; then
      # a dead JVM / missing metric line must not poison the log with
      # malformed JSON ("r":}) — record an explicit error object instead
      echo "WARN: no metric line for $sf $q (exit $rc)" >&2
      echo "{\"sf\":\"$sf\",\"q\":\"$q\",\"error\":\"no metric line\",\"exit\":$rc}" >> "$OUT"
    else
      echo "{\"sf\":\"$sf\",\"q\":\"$q\",\"r\":$line}" >> "$OUT"
      echo "done $sf $q" >&2
    fi
  done
done
