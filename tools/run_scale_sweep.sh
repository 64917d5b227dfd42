#!/bin/bash
# Chunked full-board engine-hash sweep for the scale octaves (30x/100x/300x).
#
# Why chunked: one long-lived checker process accumulates allocator state —
# the pyspark gateway + DuckDB's jemalloc oscillates between 10k-25k memory
# mappings, and at the 300x octave a heavy-oracle sequence can cross the
# kernel's default vm.max_map_count=65530, after which EVERY malloc in the
# process fails ("Failed to allocate block of N bytes (bad allocation)" with
# >100 GB of host RAM free). A fresh python+JVM+DuckDB process per chunk
# bounds that state and keeps one failure from cascading; also raise the
# kernel limit per host session:
#     sysctl -w vm.max_map_count=1048576
#
# Streaming gates run LAST in their own chunk with a bigger driver heap:
# their in-memory result sink (harness-side, so the oracle can see the
# rows) holds the full output — 28.6M sessionize rows at 300x overflow the
# default 16g. See BENCH_SCALE.md "Round 7: the full board value-verified
# at 300x" for the failure-class catalog this script encodes.
#
# Usage: tools/run_scale_sweep.sh SF_DIR [QUERY_LIST_FILE] [OUT_LOG]
#   SF_DIR           e.g. /tmp/sf30.0 (build with tools/inflate_testdata.py)
#   QUERY_LIST_FILE  whitespace-separated query names; default: every
#                    registered query except the known gate-SF-only ones
#   OUT_LOG          default /tmp/scale_sweep.log
# Env: CHUNK (default 20), CHECK_DUCK_MEM (24GB), CHECK_DUCK_THREADS (16),
#      STREAM_DRIVER_MEM (48g). At the 300x octave pass CHECK_DUCK_MEM=48GB:
#      verified to clear the full 99-query board in one invocation
#      (2026-08-15, 99 ok / 0 failed / 0 errored, all chunks rc=0),
#      including the kmeans unrolled-Lloyd oracle that OOMs a 24GB budget.
#      A straggler that still exceeds the budget reruns solo:
#      CHECK_DUCK_MEM=80GB python tools/check_correctness.py SF_DIR \
#        --engine-hash <name>
set -u
cd "$(dirname "$0")/.."
SF_DIR=${1:?usage: run_scale_sweep.sh SF_DIR [QUERY_LIST_FILE] [OUT_LOG]}
LIST_FILE=${2:-}
LOG=${3:-/tmp/scale_sweep.log}
CHUNK=${CHUNK:-20}
export CHECK_DUCK_MEM=${CHECK_DUCK_MEM:-24GB}
export CHECK_DUCK_THREADS=${CHECK_DUCK_THREADS:-16}

# The jemalloc "bad allocation" failure class this script chunks around is
# mapping-count exhaustion, not RAM (r08 measured a chunk dying mid-run at
# the kernel's default 65530 with >100 GB free). Warn loudly up front.
MAPS=$(cat /proc/sys/vm/max_map_count 2>/dev/null || echo 0)
if [ "$MAPS" -lt 262144 ]; then
  echo "WARNING: vm.max_map_count=$MAPS is low; heavy-oracle chunks can die" >&2
  echo "  with 'Failed to allocate block of N bytes (bad allocation)'." >&2
  echo "  Raise it for this host session:  sysctl -w vm.max_map_count=1048576" >&2
fi

if [ -n "$LIST_FILE" ]; then
  ALL=$(cat "$LIST_FILE")
else
  ALL=$(python - <<'EOF'
import sys
sys.path.insert(0, '.')
import __spark_entry__ as e
# the r06/r07 99-query scale list: exact all-pairs verifiers and the
# pair-emitting / probabilistic LSH twins are quarantined to gate SF by
# design (they have their own octave ladder, tools/dedup_ladder.py)
skip = {"ext_decontamination", "ext_decontamination_lsh",
        "ext_decontamination_canonical", "ext_decontamination_canonical_lsh",
        "ext_dedup_canonical", "ext_dedup_canonical_lsh",
        "ext_dedup_clusters", "ext_embedding_near_dup",
        "ext_lsh_cosine_topk", "ext_lsh_embedding_near_dup",
        "ext_minhash_lsh", "ext_ngram_jaccard",
        "ext_semantic_clusters", "ext_simhash_pairs"}
print(" ".join(q for q in e.queries() if q not in skip))
EOF
  )
fi

STREAMS=""; REST=""
for q in $ALL; do
  case $q in stream_*) STREAMS="$STREAMS $q" ;; *) REST="$REST $q" ;; esac
done

: > "$LOG"; : > "$LOG.done"
set -- $REST
i=0; N=0; BUF=""
while [ $# -gt 0 ]; do
  BUF="$BUF $1"; shift; i=$((i+1))
  if [ "$i" -eq "$CHUNK" ] || [ $# -eq 0 ]; then
    N=$((N+1))
    echo "=== chunk $N:$BUF ===" >> "$LOG"
    python tools/check_correctness.py "$SF_DIR" --engine-hash $BUF >> "$LOG" 2>&1
    echo "chunk $N rc=$?" >> "$LOG.done"
    i=0; BUF=""
  fi
done
if [ -n "$STREAMS" ]; then
  N=$((N+1))
  echo "=== chunk $N (streams):$STREAMS ===" >> "$LOG"
  CHECK_DRIVER_MEM=${STREAM_DRIVER_MEM:-48g} CHECK_MAX_RESULT=16g \
    python tools/check_correctness.py "$SF_DIR" --engine-hash $STREAMS >> "$LOG" 2>&1
  echo "chunk $N rc=$? (streams)" >> "$LOG.done"
fi
echo ALLDONE >> "$LOG.done"
grep -hE " ok, " "$LOG"
