#!/bin/bash
# Tunnel watchdog: probe device init every 2 min until it succeeds, then
# write UP to /tmp/tunnel_status and exit 0. Each probe is its own guarded
# subprocess — a down relay HANGS jax.devices() rather than erroring.
export PYTHONPATH=/root/repo:/root/.axon_site
echo DOWN > /tmp/tunnel_status
while true; do
  if timeout 120 python -c "import jax; jax.devices(); print('ok')" \
      2>/dev/null | grep -q ok; then
    echo UP > /tmp/tunnel_status
    echo "tunnel UP at $(date +%H:%M:%S)"
    exit 0
  fi
  sleep 120
done
