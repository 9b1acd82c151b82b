#!/bin/bash
# tpu_run.sh <log> <timeout_s> cmd args...
# Runs a TPU script with wedge detection: if the process shows < 15s
# CPU after 4 min (the axon-tunnel wedge signature: parked at its
# first remote op), kill it, rest 6 min, retry (up to 5 attempts).
log=$1; to=$2; shift 2
for attempt in 1 2 3 4 5; do
  echo "[tpu_run] attempt $attempt: $*" >> "$log"
  "$@" >> "$log" 2>&1 &
  pid=$!
  sleep 240
  if kill -0 $pid 2>/dev/null; then
    ut=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null || echo 99999)
    cpu=$(( ut / 100 ))
    if [ "$cpu" -lt 15 ]; then
      echo "[tpu_run] wedged (cpu=${cpu}s) -> kill + 6 min rest" >> "$log"
      kill $pid 2>/dev/null; wait $pid 2>/dev/null
      sleep 360
      continue
    fi
  fi
  waited=240
  while kill -0 $pid 2>/dev/null && [ $waited -lt $to ]; do
    sleep 30; waited=$((waited+30))
  done
  if kill -0 $pid 2>/dev/null; then
    echo "[tpu_run] timeout ${to}s -> kill" >> "$log"
    kill $pid 2>/dev/null; wait $pid 2>/dev/null; exit 124
  fi
  wait $pid; rc=$?
  echo "[tpu_run] rc=$rc" >> "$log"; exit $rc
done
echo "[tpu_run] giving up after 5 attempts" >> "$log"; exit 125
