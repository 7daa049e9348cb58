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
# Usage: tools/scaledemo1000.sh [baseDir] [outDir]
set -e
cd "$(dirname "$0")/.."
BASE="${1:-/root/testdata/sf0.1}"
OUT="${2:-/dev/shm/graft-scale1000x}"
for row in build semdedup_keep ivf_hier_topk matryoshka; do
  echo "[scaledemo1000] row=$row (fresh JVM)"
  SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.ScaleDemo1000 $BASE $OUT $row"
done
