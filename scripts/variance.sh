#!/bin/bash
# Regenerates the BASELINE.md "Recorded 5-run spreads" table with the
# exact recorded method (BenchOne -n 5: one JVM, GC-leveled,
# cache-cleared between runs, per-run wall AND process-CPU seconds) so
# later rounds' numbers cannot drift from the method that produced the
# earlier ones. Run on an otherwise-idle machine; never concurrently
# with Bench (cross-job interference is measured and real — see
# BASELINE.md "Variance").
#
#   scripts/variance.sh [query ...]     # default: the heavy/flap-prone set
#
# Output: the markdown table rows (first run = cold/JIT; warm max/min
# is computed over runs 2..N) plus the raw BenchOne lines on stderr.
set -euo pipefail
cd "$(dirname "$0")/.."

# one space-joined string: the names are interpolated INSIDE the one
# quoted sbt command — an array expansion would send the second and
# later names to sbt as separate (invalid) commands
QUERIES="${*:-q_minhash_lsh q_ngram_capped q_dedup_clusters q_dedup_star q_cluster_append q_neardup_append q_neardup_ingest q_stream_cluster_append q_stream_sessionize q_stream_join q_stream_dedup q_stream_index_append q_store_cdc q_store_matview q_stream_quarantine}"
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  sbt -batch "runMain graft.BenchOne -n 5 $QUERIES" 2>&1 |
  tee /dev/stderr |
  awk '
    /\[run [0-9]+ @[0-9]+\] wall/ {
      # "  [run N @epoch] wall X s  cpu Y s" -> collect X in arrival order
      for (i = 1; i <= NF; i++) if ($i == "wall") { runs[++n] = $(i + 1) }
      next
    }
    # sbt prefixes every line with "[info] ", so the query name is $2
    # there and $1 when BenchOne runs bare — accept both
    ($1 ~ /^q_/ || $2 ~ /^q_/) && n > 0 {
      name = ($1 ~ /^q_/) ? $1 : $2
      wmax = 0; wmin = 1e18
      series = runs[1] " (first=cold)"
      for (i = 2; i <= n; i++) {
        series = series " " runs[i]
        if (runs[i] + 0 > wmax) wmax = runs[i] + 0
        if (runs[i] + 0 < wmin) wmin = runs[i] + 0
      }
      printf "| %s | %s | %.2f |\n", name, series, wmax / wmin
      n = 0
    }
  '
