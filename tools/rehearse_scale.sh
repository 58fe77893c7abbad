#!/bin/bash
# Two-decade scale rehearsal: run each headliner query STANDALONE (fresh
# JVM, quiet box) at sf0.1 / sf1 / sf10 and append one JSON line per run
# to the log. Usage: tools/rehearse_scale.sh <outfile> [query ...]
#
# GRAFT_SAMPLES (default 2) legs run per (query, sf); after the legs a
# summary line {"sf","q","summary":true,"legs":[...],"min":...,"max":...}
# is appended. Identical-plan sf10 legs vary up to 1.6x on this box
# (SCALING.md), so scale claims must quote the min-max RANGE, never a
# single sample — this makes that discipline mechanical.
set -u
OUT="$1"; shift
SAMPLES="${GRAFT_SAMPLES:-2}"
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
    vals=()
    for leg in $(seq 1 "$SAMPLES"); do
      line=$(SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_SF_DIR="$sf" \
        java -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
        "-Xmx${GRAFT_XMX:-48g}" graft.Bench 2>/dev/null | grep '"metric"'; \
        exit "${PIPESTATUS[0]}")
      rc=$?   # the JVM's exit status, not grep's — a dead JVM must log as such
      if [ -z "$line" ]; then
        # a dead JVM / missing metric line must not poison the log with
        # malformed JSON ("r":}) — record an explicit error object instead
        echo "WARN: no metric line for $sf $q leg $leg (exit $rc)" >&2
        echo "{\"sf\":\"$sf\",\"q\":\"$q\",\"leg\":$leg,\"error\":\"no metric line\",\"exit\":$rc}" >> "$OUT"
      else
        echo "{\"sf\":\"$sf\",\"q\":\"$q\",\"leg\":$leg,\"r\":$line}" >> "$OUT"
        # an unparseable metric line must not poison vals with an empty
        # string — the summary's float('') would crash and silently drop
        # the min-max line the range discipline depends on
        v=$(printf '%s' "$line" | python3 -c 'import json,sys; print(json.load(sys.stdin)["value"])' 2>/dev/null)
        if [ -n "$v" ]; then
          vals+=("$v")
          echo "done $sf $q leg $leg: ${v}s" >&2
        else
          echo "WARN: unparseable metric line for $sf $q leg $leg" >&2
        fi
      fi
    done
    if [ ${#vals[@]} -gt 0 ]; then
      printf '%s\n' "${vals[@]}" | python3 -c "
import sys
vs = [float(x) for x in sys.stdin.read().split()]
import json
print(json.dumps({'sf': '$sf', 'q': '$q', 'summary': True,
                  'legs': vs, 'min': min(vs), 'max': max(vs)}))" >> "$OUT"
    fi
  done
done
