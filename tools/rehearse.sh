#!/bin/sh
# Scale rehearsals — one mode per run (full catalog + per-mode docs in
# ScaleRehearsal.scala's scaladoc; findings recorded in SCALE_r*.md):
#   tools/rehearse.sh <mode>
# Modes: (default 10x) curve40 curve100 curve40r10 kmeansassign substr
#        cut semdedup40 hotbucket recall semknob cc minhashrecall
#        cowdml rangejoin skewlm bpe bpetrain zorder asofskew manifest
#        sidecar morchurn statsprune partprune
# Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_DRIVER_MEM
# (the curves were measured at the 100g default on a 128 GiB box).
set -e
cd "$(dirname "$0")/.."
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-100g}" \
  sbt --error "runMain graft.ScaleRehearsal ${1:-}"
