#!/bin/bash
# Third-decade (1000x) ScaleDemo protocol — ONE JVM PER ROW (round 14,
# VERDICT r13 #6): the first single-JVM 1000x pass was kernel-OOM-killed
# by localCheckpoint blocks accumulating across rows (each row alone
# fits; three rows' retained blocks plus tmpfs shuffle space together do
# not). Each sbt -batch invocation is a fresh JVM, so every reading
# starts from a clean heap and the run needs no babysitting. The fixture
# build is existence-gated inside ScaleDemo1000, so only the first row
# pays it.
#
# Heap: 64g, NOT larger (measured round 14): /dev/shm is RAM, so a 96g
# heap plus tens of GB of tmpfs shuffle scratch exceeds a 126 GiB host
# mid-row — exit 137. The scratch dir is wiped between rows for the
# same reason (stale spill from a previous row counts against the next
# row's budget).
#
# Usage: tools/scaledemo1000.sh [baseDir] [outDir]
set -e
cd "$(dirname "$0")/.."
BASE="${1:-/root/testdata/sf0.1}"
OUT="${2:-/dev/shm/graft-scale1000x}"
for row in build semdedup_keep ivf_hier_topk ivf_hier_refine_topk matryoshka ann_ivfpq_hier_topk streaming_semdedup_keep; do
  echo "[scaledemo1000] row=$row (fresh JVM)"
  rm -rf /dev/shm/graft-spark/* 2>/dev/null || true
  # DRAIN_PARTS=32: the incremental screens' 4-partition fixture pin is
  # an 8x parallelism loss at this decade (BASELINE.md round-16) — sized
  # to the host like the fallback threshold above, default untouched.
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-64g}" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_DRAIN_PARTS="${SPARK_GRAFT_DRAIN_PARTS:-32}" \
    sbt -batch "runMain graft.ScaleDemo1000 $BASE $OUT $row"
done
