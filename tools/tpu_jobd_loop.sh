#!/bin/bash
# Keep tools/tpu_jobd.py alive across tunnel outages.  A jobd process that
# fails backend init (or wedges mid-init) must be replaced by a FRESH
# process — JAX caches init failure in-process.  Kill hung init attempts
# by PID after ~20 min; never pattern-kill (pkill can match your session).
cd "$(dirname "$0")/.."
while true; do
  if [ -f /tmp/tpu_jobs/QUITLOOP ]; then exit 0; fi
  timeout 14400 python tools/tpu_jobd.py >> /tmp/tpu_jobd.log 2>&1
  echo "jobd exited rc=$? $(date) — retrying in 90s" >> /tmp/tpu_jobd.log
  sleep 90
done
