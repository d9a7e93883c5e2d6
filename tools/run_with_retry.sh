#!/bin/bash
# Watchdog for TPU jobs behind the flaky axon tunnel: the first device op
# occasionally hangs forever (thread stuck in socket wait at init). Launch
# the command, require the log to show life (grow beyond the jax warning)
# within GRACE seconds, else kill and relaunch, up to TRIES attempts.
#   tools/run_with_retry.sh LOGFILE GRACE TRIES CMD...
LOG=$1; GRACE=$2; TRIES=$3; shift 3
for attempt in $(seq 1 "$TRIES"); do
    : > "$LOG"
    "$@" >> "$LOG" 2>&1 &
    PID=$!
    echo "[retry-wrapper] attempt $attempt pid $PID" >&2
    t=0
    while [ "$t" -lt "$GRACE" ]; do
        sleep 10; t=$((t+10))
        # alive output = any line beyond the xla_bridge warning
        if grep -v "xla_bridge" "$LOG" | grep -q "[^[:space:]]"; then
            wait "$PID"; exit $?
        fi
        if ! kill -0 "$PID" 2>/dev/null; then
            wait "$PID"; rc=$?
            # died before producing output — treat as failed attempt
            echo "[retry-wrapper] exited rc=$rc before output" >&2
            break
        fi
    done
    if kill -0 "$PID" 2>/dev/null; then
        echo "[retry-wrapper] no output after ${GRACE}s — killing $PID" >&2
        kill "$PID" 2>/dev/null; sleep 3; kill -9 "$PID" 2>/dev/null
    fi
done
echo "[retry-wrapper] giving up after $TRIES attempts" >&2
exit 1
