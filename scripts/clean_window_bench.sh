#!/bin/bash
# Poll the three throttle-probe classes; the moment a pre-flight reads
# clean (cpu <= 0.60 s, par <= 0.65 s, spark <= 1.0 s — BASELINE.md
# "healthy bands"), fire the round's measurement sequence back-to-back
# so a short clean slot is never spent on reaction latency:
#   1. full 170-query bench at sf0.1  -> /tmp/bench_sf01_attemptN.log
#   2. full 170-query bench at sf1    -> /tmp/bench_sf1_attemptN.log
#   3. BenchOne adjudications         -> /tmp/benchone_attemptN.log
# Each bench artifact still carries its own bracketing/mid-run probe
# fields and window_dirty verdict — the pre-flight only picks WHEN to
# start; the artifact adjudicates itself.
set -uo pipefail
cd "$(dirname "$0")/.."

ATTEMPT="${1:-1}"
SF1_DIR="${SF1_DIR:-/tmp/sf1}"
POLL_SECS="${POLL_SECS:-300}"

probe_clean() {
  local out
  out=$(SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Probe --spark" 2>&1 |
    grep -E "^\[info\] [0-9]|spark=" | sed 's/\[info\] //')
  echo "$(date -u +%H:%M:%S) probe: $out" >> /tmp/probe_poll.log
  python3 - "$out" <<'EOF'
import sys
lines = sys.argv[1].strip().splitlines()
cpu = [float(x) for x in lines[0].split(",par=")[0].split(",")]
par = float(lines[0].split("par=")[1])
spark = [float(x) for x in lines[1].replace("spark=", "").split(",")]
ok = all(c <= 0.60 for c in cpu) and par <= 0.65 and all(s <= 1.0 for s in spark)
sys.exit(0 if ok else 1)
EOF
}

while ! probe_clean; do
  sleep "$POLL_SECS"
done
echo "$(date -u +%H:%M:%S) CLEAN WINDOW — firing bench sequence" >> /tmp/probe_poll.log

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > "/tmp/bench_sf01_attempt${ATTEMPT}.log" 2>&1

if [ -d "$SF1_DIR" ]; then
  SPARK_GRAFT_SF_DIR="$SF1_DIR" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > "/tmp/bench_sf1_attempt${ATTEMPT}.log" 2>&1
fi

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.BenchOne -n 5 q_embed_append q_median q_stream_store_follow q_store_matview q_store_incremental" \
  > "/tmp/benchone_attempt${ATTEMPT}.log" 2>&1

echo "$(date -u +%H:%M:%S) sequence done" >> /tmp/probe_poll.log
