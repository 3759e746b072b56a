#!/bin/bash
# Multi-host service placement via the JAX multi-controller runtime
# (SURVEY.md section 5.8(b)). Each service process joins the same
# coordinator with a distinct process id; on real multi-host TPU pods set
# HOSTS/COORDINATOR accordingly — this script demonstrates the 2+ process
# topology on one machine (reference counterpart: per-GPU placement in
# webapp/start_webapps_in_tmux.sh:21-43).

set -e
SESSION=${SESSION:-diffhandles_dist}
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
PY=${PY:-python}
VARIANT=${VARIANT:-sd2}
COORDINATOR=${COORDINATOR:-localhost:9911}

# service name, HTTP port, distributed process id
PLACEMENT=(
  "diffhandles 8889 0"
  "depth 8890 1"
)
NUM=${#PLACEMENT[@]}

tmux new-session -d -s "$SESSION" -n svc0
i=0
for svc in "${PLACEMENT[@]}"; do
  set -- $svc
  name=$1; port=$2; pid=$3
  win="svc$i"
  [ "$i" -gt 0 ] && tmux new-window -t "$SESSION" -n "$win"
  tmux send-keys -t "$SESSION:$win" \
    "cd $REPO_DIR && DIFFHANDLES_COORDINATOR=$COORDINATOR \
DIFFHANDLES_NUM_PROCESSES=$NUM DIFFHANDLES_PROCESS_ID=$pid \
$PY -m diffusionhandles_tpu.service.run $name --port $port \
--variant $VARIANT" Enter
  i=$((i + 1))
done

sleep 20
echo "distributed services started in tmux session '$SESSION'"
