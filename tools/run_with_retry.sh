#!/bin/bash
# Watchdog for TPU jobs behind the flaky axon tunnel. Two distinct hang
# modes are covered:
#   1. init hang — the first device op never returns (thread stuck in a
#      socket wait): require the log to show life (grow beyond the jax
#      warning) within GRACE seconds of launch;
#   2. mid-run hang — a later device op futex-waits forever: after life is
#      seen, declare a stall when BOTH the log size and the process's
#      cumulative CPU time stop advancing for STALL seconds (host compute
#      phases burn CPU even when silent, so CPU growth alone keeps the job
#      alive; a healthy device phase writes logs or finishes).
# On either hang the job is killed (by recorded PID, never by pattern) and
# relaunched, up to TRIES attempts.
#   tools/run_with_retry.sh LOGFILE GRACE TRIES CMD...
# STALL defaults to 300 s; override via env STALL=...
# COOLDOWN (default 0) sleeps between attempts — the tunnel backend holds a
# dead client's claim for many minutes, so an immediate relaunch after a
# hang-kill tends to hang again; a cooldown lets the claim expire.
LOG=$1; GRACE=$2; TRIES=$3; shift 3
STALL=${STALL:-300}
COOLDOWN=${COOLDOWN:-0}
cpu_ticks() {  # utime+stime of PID $1 plus all its threads' children, in ticks
    awk '{print $14+$15+$16+$17}' "/proc/$1/stat" 2>/dev/null || echo 0
}
io_chars() {  # rchar+wchar of PID $1 — includes socket traffic; a client
    # hung on a dead tunnel op does EXACTLY zero io (measured), while
    # healthy device phases stream bytes continuously
    awk '/^rchar|^wchar/ {s+=$2} END {print s+0}' "/proc/$1/io" 2>/dev/null || echo 0
}
for attempt in $(seq 1 "$TRIES"); do
    : > "$LOG"
    "$@" >> "$LOG" 2>&1 &
    PID=$!
    echo "[retry-wrapper] attempt $attempt pid $PID" >&2
    t=0; alive_seen=0
    while [ "$t" -lt "$GRACE" ]; do
        sleep 10; t=$((t+10))
        if grep -v "xla_bridge" "$LOG" | grep -q "[^[:space:]]"; then
            alive_seen=1; break
        fi
        if ! kill -0 "$PID" 2>/dev/null; then
            wait "$PID"; rc=$?
            echo "[retry-wrapper] exited rc=$rc before output" >&2
            break
        fi
    done
    if [ "$alive_seen" -eq 1 ]; then
        # stall watchdog: log bytes + CPU ticks must advance within STALL
        last_sz=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
        last_cpu=$(cpu_ticks "$PID")
        last_io=$(io_chars "$PID")
        stall_t=0
        while kill -0 "$PID" 2>/dev/null; do
            sleep 30
            sz=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
            cpu=$(cpu_ticks "$PID")
            io=$(io_chars "$PID")
            # alive = log grew, any real io (device traffic), or >10 s CPU
            # in the window (host compute phase). The tunnel client's idle
            # heartbeat bursts ~1.4 s CPU with zero io — below both bars.
            if [ "$sz" -gt "$last_sz" ] || [ $((io - last_io)) -gt 4096 ]                || [ $((cpu - last_cpu)) -gt 1000 ]; then
                last_sz=$sz; last_cpu=$cpu; last_io=$io; stall_t=0
            else
                stall_t=$((stall_t+30))
                if [ "$stall_t" -ge "$STALL" ]; then
                    echo "[retry-wrapper] stalled ${STALL}s (no log/CPU" \
                         "growth) — killing $PID" >&2
                    kill "$PID" 2>/dev/null; sleep 3
                    kill -9 "$PID" 2>/dev/null
                    break
                fi
            fi
        done
        if ! kill -0 "$PID" 2>/dev/null && [ "$stall_t" -lt "$STALL" ]; then
            wait "$PID"; exit $?
        fi
        wait "$PID" 2>/dev/null
        [ "$COOLDOWN" -gt 0 ] && { echo "[retry-wrapper] cooldown ${COOLDOWN}s" >&2; sleep "$COOLDOWN"; }
        continue   # stalled -> next attempt
    fi
    if kill -0 "$PID" 2>/dev/null; then
        echo "[retry-wrapper] no output after ${GRACE}s — killing $PID" >&2
        kill "$PID" 2>/dev/null; sleep 3; kill -9 "$PID" 2>/dev/null
        [ "$COOLDOWN" -gt 0 ] && { echo "[retry-wrapper] cooldown ${COOLDOWN}s" >&2; sleep "$COOLDOWN"; }
    fi
done
echo "[retry-wrapper] giving up after $TRIES attempts" >&2
exit 1
