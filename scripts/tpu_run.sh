#!/bin/bash
# Submit a python snippet (file or stdin) to the persistent TPU process and
# print its output.  Usage: tpu_run.sh [file.py] ; or pipe code on stdin.
set -e
JOBS=/tmp/tpu_jobs
N=$(date +%s%N)
if [ -n "$1" ]; then cp "$1" "$JOBS/$N.py.tmp"; else cat > "$JOBS/$N.py.tmp"; fi
mv "$JOBS/$N.py.tmp" "$JOBS/$N.py"
for i in $(seq 1 1200); do
  [ -f "$JOBS/$N.done" ] && break
  sleep 0.5
done
if [ -f "$JOBS/$N.done" ]; then cat "$JOBS/$N.out"; else echo "TIMEOUT waiting for job"; fi
