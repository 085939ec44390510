#!/bin/bash
# Round-4 reference-scale A/B orchestration (the TPU half; the torch half
# is `tools/ab_reference_retrieval.py --run <name> --seed N` + `tools/
# ab_chain_captions.py train --side ref`, run concurrently on the host).
#
# Stages, in order, fully unattended:
#   1. seed-0 yc2big retrieval (chunked: N epochs per child process —
#      the axon client leaks host RAM per bulk transfer, so children are
#      recycled; the persistent XLA compile cache makes restarts cheap).
#      Auto-restarts the wrapper if a child had to be killed (e.g. a
#      wedged tunnel client) — progress is never lost, the trainer
#      resumes from the newest checkpoint.
#   2. embedding export from the BEST seed-0 checkpoint (both splits).
#   3. MART caption training on those embeddings (the chained caption
#      A/B, config/caption/ab/yc2big_mart_ab.yaml).
#   4. seed-1 retrieval, same protocol as seed 0.
#
# Usage: nohup tools/ab_orchestrate_yc2big.sh > /tmp/tpu_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
CONFIG=config/retrieval/ab/yc2big_ab.yaml
CHUNK=${EPOCHS_PER_CHUNK:-4}
# final-epoch checkpoint marker derived from the yaml (same as
# ab_tpu_retrieval.py run_chunked), not a hardcoded epoch count
LAST_EPOCH=$(python - "$CONFIG" <<'PY'
import sys, yaml
print(int(yaml.safe_load(open(sys.argv[1]))["train"]["num_epochs"]) - 1)
PY
)

run_seed() { # $1 = run name (tpubigs0), $2 = seed, $3 = pidfile
  local dir="experiments_tpu_ab/retrieval/default/yc2big_ab_${1}1"
  nohup python tools/ab_tpu_retrieval.py --run "$1" --seed "$2" \
    --config "$CONFIG" --chunked --epochs_per_chunk "$CHUNK" \
    >> "/tmp/${1}_chunked.log" 2>&1 &
  echo $! > "$3"
  local tries=0
  while [ ! -f "$dir/models/trainerstate_${LAST_EPOCH}.json" ]; do
    if ! kill -0 "$(cat "$3")" 2>/dev/null; then
      tries=$((tries+1))
      if [ "$tries" -gt 6 ]; then echo "[queue] giving up on $1"; return 1; fi
      echo "[queue] $1 wrapper dead, incomplete -> restart #$tries at $(date +%H:%M)"
      nohup python tools/ab_tpu_retrieval.py --run "$1" --seed "$2" \
        --config "$CONFIG" --chunked --epochs_per_chunk "$CHUNK" \
        >> "/tmp/${1}_chunked.log" 2>&1 &
      echo $! > "$3"
      sleep 30
    fi
    sleep 60
  done
  while kill -0 "$(cat "$3")" 2>/dev/null; do sleep 30; done
  echo "[queue] $1 complete at $(date +%H:%M)"
}

run_seed tpubigs0 0 /tmp/tpubigs0.pid || exit 1
echo "[queue] exporting tpu embeddings"
python tools/ab_chain_captions.py export --side tpu > /tmp/chain_export_tpu.log 2>&1 \
  && { echo "[queue] training tpu caption side at $(date +%H:%M)";
       python tools/ab_chain_captions.py train --side tpu > /tmp/chain_train_tpu.log 2>&1;
       echo "[queue] caption train rc=$? at $(date +%H:%M)"; } \
  || echo "[queue] export FAILED (see /tmp/chain_export_tpu.log)"
run_seed tpubigs1 1 /tmp/tpubigs1.pid
