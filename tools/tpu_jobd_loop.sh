#!/bin/bash
# Keep tools/tpu_jobd.py alive across tunnel outages.  A jobd process that
# fails backend init (or wedges mid-init) must be replaced by a FRESH
# process — JAX caches init failure in-process.  Init attempts that produce
# no READY marker within 25 min are killed by PID (never pattern-kill: the
# pattern can match your own session).  Once READY, the daemon runs
# unbounded.
cd "$(dirname "$0")/.."
while true; do
  if [ -f /tmp/tpu_jobs/QUITLOOP ]; then exit 0; fi
  rm -f /tmp/tpu_jobs/READY
  python tools/tpu_jobd.py >> /tmp/tpu_jobd.log 2>&1 &
  pid=$!
  for i in $(seq 1 50); do
    sleep 30
    if [ -f /tmp/tpu_jobs/READY ]; then break; fi
    if ! kill -0 "$pid" 2>/dev/null; then break; fi
  done
  if ! [ -f /tmp/tpu_jobs/READY ] && kill -0 "$pid" 2>/dev/null; then
    echo "jobd init hung >25min, killing $pid $(date)" >> /tmp/tpu_jobd.log
    kill "$pid"; sleep 5; kill -9 "$pid" 2>/dev/null
  fi
  wait "$pid"
  echo "jobd exited rc=$? $(date) — retrying in 90s" >> /tmp/tpu_jobd.log
  sleep 90
done
