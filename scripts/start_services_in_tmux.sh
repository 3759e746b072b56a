#!/bin/bash
# Launch the service mesh, one tmux window per service.
# Parity with reference: webapp/start_webapps_in_tmux.sh (ports 8888-8893).
# On TPU all services share the chip; use DEVICES to pin differently when
# multiple chips/processes are available.

set -e
SESSION=${SESSION:-diffhandles_tpu}
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
PY=${PY:-python}
VARIANT=${VARIANT:-sd2}

tmux new-session -d -s "$SESSION" -n core
tmux send-keys -t "$SESSION:core" \
  "cd $REPO_DIR && $PY -m diffusionhandles_tpu.service.run diffhandles --port 8889 --variant $VARIANT" Enter

for svc in "pipeline 8888" "depth 8890" "remover 8891" "selector 8892" "text2img 8893"; do
  set -- $svc
  name=$1; port=$2
  tmux new-window -t "$SESSION" -n "$name"
  tmux send-keys -t "$SESSION:$name" \
    "cd $REPO_DIR && $PY -m diffusionhandles_tpu.service.run $name --port $port --variant $VARIANT" Enter
done

# startup barrier (reference waits 20 s, start_webapps_in_tmux.sh:55)
sleep 20
echo "services started in tmux session '$SESSION'"
