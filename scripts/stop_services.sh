#!/bin/bash
# Teardown (parity with reference: webapp/stop_webapps.sh).
tmux kill-session -t "${SESSION:-diffhandles_tpu}" 2>/dev/null || true
pkill -f "diffusionhandles_tpu.service.run" 2>/dev/null || true
echo "services stopped"
