#!/bin/bash
# Watchdog for TPU jobs behind the flaky axon tunnel. A hung tunnel client
# (init hang or mid-run device-op hang) does exactly ZERO socket I/O and
# only drips heartbeat CPU (~1.4 s every couple of minutes), while healthy
# phases either write logs, stream device bytes, or saturate host CPU.
# Liveness = log grew, OR >4 KB of I/O, OR >10 s CPU in a 30 s window.
# After STALL seconds with no liveness the job is killed (by recorded PID,
# never by pattern) and relaunched after COOLDOWN, up to TRIES attempts.
# GRACE is kept for CLI compatibility; it no longer gates on log output —
# quiet-until-done jobs (bench.py prints one JSON line at the end) were
# killed by the old output-based grace check while compiling healthily.
#   tools/run_with_retry.sh LOGFILE GRACE TRIES CMD...
# Env: STALL (default 300 s), COOLDOWN (default 0 s).
LOG=$1; GRACE=$2; TRIES=$3; shift 3
STALL=${STALL:-300}
COOLDOWN=${COOLDOWN:-0}
cpu_ticks() {  # utime+stime (+reaped children) of PID $1, in ticks
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
    last_sz=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    last_cpu=$(cpu_ticks "$PID")
    last_io=$(io_chars "$PID")
    stall_t=0
    stalled=0
    while kill -0 "$PID" 2>/dev/null; do
        sleep 30
        kill -0 "$PID" 2>/dev/null || break
        sz=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
        cpu=$(cpu_ticks "$PID")
        io=$(io_chars "$PID")
        if [ "$sz" -gt "$last_sz" ] || [ $((io - last_io)) -gt 4096 ] \
           || [ $((cpu - last_cpu)) -gt 1000 ]; then
            last_sz=$sz; last_cpu=$cpu; last_io=$io; stall_t=0
        else
            stall_t=$((stall_t+30))
            if [ "$stall_t" -ge "$STALL" ]; then
                echo "[retry-wrapper] stalled ${STALL}s (no log/io/CPU" \
                     "growth) — killing $PID" >&2
                kill "$PID" 2>/dev/null; sleep 3
                kill -9 "$PID" 2>/dev/null
                stalled=1
                break
            fi
        fi
    done
    if [ "$stalled" -eq 0 ]; then
        wait "$PID"; exit $?
    fi
    wait "$PID" 2>/dev/null
    [ "$COOLDOWN" -gt 0 ] && { echo "[retry-wrapper] cooldown ${COOLDOWN}s" >&2; sleep "$COOLDOWN"; }
done
echo "[retry-wrapper] giving up after $TRIES attempts" >&2
exit 1
