#!/bin/bash
# TPU tunnel watcher: probes jax.devices() on the axon platform every
# POLL seconds, recording status to /tmp/tpu_status. Exits the moment the
# TPU answers (leaving the tunnel free for real jobs). While a real TPU
# job is running, this watcher must NOT be running — the axon tunnel is
# exclusive and a second device query kills the job.
POLL=${POLL:-600}
OUT=/tmp/tpu_status
while true; do
  echo "probing $(date -u +%H:%M:%S)" > "$OUT"
  if timeout 150 python -c 'import jax; d=jax.devices(); assert d' >/dev/null 2>&1; then
    echo "up $(date -u +%H:%M:%S)" > "$OUT"
    exit 0
  fi
  echo "down $(date -u +%H:%M:%S)" > "$OUT"
  sleep "$POLL"
done
