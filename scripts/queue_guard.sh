#!/bin/bash
# Supervise the r5 queue against axon-relay wedges. Two measured
# signatures: (a) a queue python blocks on the relay socket with its CPU
# jiffies exactly frozen (22:53-23:30 incident); (b) the slow-creep
# variant (00:58-01:15 incident) — the wedged client still burns a few
# jiffies/minute on futex heartbeats, so an equality test never fires.
# Every 60s, sum utime+stime over all python descendants of the queue
# root; if the sum advances by LESS THAN MIN_JIFFIES (default 100 ≈ 1 s
# of CPU — an actively training/evaluating python burns orders of
# magnitude more) over STALL_MIN minutes while the queue is alive, kill
# the queue tree by exact PIDs, wait for a relay health probe, and
# relaunch the restart-safe queue script (Q_SCRIPT, default
# scripts/r5_queue4.sh). Root-death relaunches also gate on relay
# health first — relaunching into a wedged relay just re-wedges.
# Exits when the queue log (Q_LOG) contains the done marker (Q_DONE).
# Logs to /tmp/queue_guard.log.
cd /root/repo
STALL_MIN=${STALL_MIN:-15}
MIN_JIFFIES=${MIN_JIFFIES:-100}
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
    log "queue root gone without $Q_DONE; waiting for healthy relay"
    until relay_ok; do log "relay still wedged"; sleep 60; done
    log "relay healthy; relaunching"
    bash "$Q_SCRIPT" >> "$Q_LOG" 2>&1 &
    echo $! > "$Q_PIDFILE"
    last_j=-1; last_change=$(date +%s); sleep 60; continue
  fi
  j=$(jiffies_sum)
  now=$(date +%s)
  if [ "$last_j" = "-1" ] || [ $(( j - last_j )) -ge "$MIN_JIFFIES" ]; then
    last_j=$j; last_change=$now
  elif [ $(( (now - last_change) / 60 )) -ge "$STALL_MIN" ]; then
    # A long relay-side compile looks identical from the client (it just
    # waits); an independent probe tells them apart — a healthy relay
    # answers a tiny matmul in seconds even while compiling.
    if relay_ok; then
      log "stall ($last_j->$j over $(( (now - last_change) / 60 ))m) but relay answers probes — likely long compile; extending"
      last_j=$j; last_change=$now; sleep 60; continue
    fi
    log "WEDGE: jiffies crept $last_j->$j (<$MIN_JIFFIES) over $(( (now - last_change) / 60 ))m AND relay probe failed; killing queue tree"
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
