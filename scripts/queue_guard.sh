#!/bin/bash
# Supervise the r5 queue against axon-relay wedges (measured signature:
# a queue python blocks on the relay socket with its CPU jiffies exactly
# frozen — 22:53-23:30 incident). Every 60s, sum utime+stime over all
# python descendants of the queue root; if the sum does not advance for
# STALL_MIN minutes while the queue is alive, kill the queue tree by
# exact PIDs, wait for a relay health probe, and relaunch the
# restart-safe queue script (Q_SCRIPT, default scripts/r5_queue4.sh).
# Exits when the queue log (Q_LOG) contains the done marker (Q_DONE).
# Logs to /tmp/queue_guard.log.
cd /root/repo
STALL_MIN=${STALL_MIN:-20}
Q_SCRIPT=${Q_SCRIPT:-scripts/r5_queue4.sh}
Q_LOG=${Q_LOG:-runs_queue4.log}
Q_DONE=${Q_DONE:-QUEUE4_DONE}
Q_PIDFILE=${Q_PIDFILE:-/tmp/queue4.pid}
LOG=/tmp/queue_guard.log
log () { echo "[guard $(date +%H:%M:%S)] $*" >> "$LOG"; }

descendants () { # descendants <pid> — pid plus all transitive children
  local pid=$1 out="$1" kids
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  for k in $kids; do out="$out $(descendants "$k")"; done
  echo "$out"
}

qpid () { cat "$Q_PIDFILE" 2>/dev/null; }

jiffies_sum () { # CPU jiffies over all python descendants of the queue
  local total=0 p
  for p in $(descendants "$(qpid)" 2>/dev/null); do
    if grep -qE "python" "/proc/$p/cmdline" 2>/dev/null; then
      local j
      j=$(awk '{print $14+$15}' "/proc/$p/stat" 2>/dev/null) || continue
      total=$((total + j))
    fi
  done
  echo "$total"
}

relay_ok () {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256))
assert float((x@x).sum()) == 256.0*256*256
" >/dev/null 2>&1
}

log "start (stall threshold ${STALL_MIN}m)"
last_j=-1
last_change=$(date +%s)
while true; do
  if grep -q "$Q_DONE" "$Q_LOG" 2>/dev/null; then
    log "queue done; guard exiting"; exit 0
  fi
  if ! kill -0 "$(qpid)" 2>/dev/null; then
    log "queue root gone without QUEUE3_DONE; relaunching"
    bash "$Q_SCRIPT" >> "$Q_LOG" 2>&1 &
    echo $! > "$Q_PIDFILE"
    last_j=-1; last_change=$(date +%s); sleep 60; continue
  fi
  j=$(jiffies_sum)
  now=$(date +%s)
  if [ "$j" != "$last_j" ]; then
    last_j=$j; last_change=$now
  elif [ $(( (now - last_change) / 60 )) -ge "$STALL_MIN" ]; then
    log "WEDGE: jiffies frozen at $j for $(( (now - last_change) / 60 ))m; killing queue tree"
    pids=$(descendants "$(qpid)")
    kill $pids 2>/dev/null; sleep 5
    for p in $pids; do kill -9 "$p" 2>/dev/null; done
    until relay_ok; do log "relay still wedged"; sleep 60; done
    log "relay healthy; relaunching queue in 30s"; sleep 30
    bash "$Q_SCRIPT" >> "$Q_LOG" 2>&1 &
    echo $! > "$Q_PIDFILE"
    log "queue relaunched pid $(qpid)"
    last_j=-1; last_change=$(date +%s)
  fi
  sleep 60
done
