#!/bin/bash
# Round-5 reference-side A/B queue (runs detached on the 1-core host):
#   1. chained caption A/B, second seed: MART (torch reference trainer)
#      on the REFERENCE side's own exported yc2big COOT embeddings
#      (seed 1, run refcapbig1 -> experiments_ref_ab/caption/.../
#      yc2big_mart_ab_refcapbig11), ~7h.
#   2. yc2big retrieval A/B, third seed (seed 2, run refbigs2), ~3h,
#      resumable/chunked via tools/ab_reference_retrieval.py.
# Each stage retries with --resume on crash (the reference trainer
# checkpoints per epoch). Progress + tracebacks land in /tmp/ab_queue.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/ab_queue.log
echo "[queue] start $(date '+%F %T') pid $$" >> "$LOG"
echo $$ > /tmp/ab_queue.pid

run_with_retries() {
  local label="$1"; shift
  local tries=0 rc=1
  while [ $tries -lt 8 ]; do
    if [ $tries -eq 0 ]; then
      echo "[queue] $label: start $(date '+%T')" >> "$LOG"
      "$@" >> "$LOG" 2>&1
    else
      echo "[queue] $label: retry $tries (--resume) $(date '+%T')" >> "$LOG"
      "$@" --resume >> "$LOG" 2>&1
    fi
    rc=$?
    [ $rc -eq 0 ] && break
    tries=$((tries + 1))
    sleep 30
  done
  echo "[queue] $label: done rc=$rc $(date '+%T')" >> "$LOG"
  return $rc
}

run_with_retries "caption refcapbig1 seed1" \
  python tools/ab_reference_caption.py \
    --config config/caption/ab/yc2big_mart_ab.yaml \
    --annotations_dir data/yc2big_caption/annotations \
    --coot_feat_dir data/yc2big_caption/embeddings_ref \
    --run refcapbig1 --seed 1

run_with_retries "retrieval refbigs2 seed2" \
  python tools/ab_reference_retrieval.py \
    --config config/retrieval/ab/yc2big_ab.yaml \
    --run refbigs2 --seed 2

echo "[queue] all done $(date '+%F %T')" >> "$LOG"
