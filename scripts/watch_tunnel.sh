#!/bin/bash
# Supervise the round-3 chip chain across axon relay outages.
#
# Loop forever:
#   - chain5 not running + tunnel up (two checks 60 s apart): launch it.
#     Relaunching is safe — the pretrain suite skips completed runs, the
#     other phases are idempotent re-measurements.
#   - chain5 running + tunnel DOWN + its log stale >30 min: the process is
#     wedged in un-completable device RPCs (observed 2026-08-17 19:27
#     outage; such a process never recovers) — kill it BY PID and re-arm.
#
# Never kills by pattern; only the PID it started (/tmp/r3_chain5.pid).
cd /root/repo
LOG=results/r3_chain5.log
PIDF=/tmp/r3_chain5.pid

tunnel_up() { timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; }
chain_alive() { [ -f "$PIDF" ] && kill -0 "$(cat "$PIDF")" 2>/dev/null; }

echo "$(date -u +%FT%TZ) supervising chain5 (tunnel 127.0.0.1:8082)"
while true; do
    if chain_alive; then
        if ! tunnel_up && [ -f "$LOG" ]; then
            age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
            if [ "$age" -gt 1800 ]; then
                echo "$(date -u +%FT%TZ) tunnel down and $LOG stale ${age}s:" \
                     "killing wedged chain5 pid $(cat "$PIDF")"
                kill "$(cat "$PIDF")" 2>/dev/null
                sleep 10
                kill -9 "$(cat "$PIDF")" 2>/dev/null
                rm -f "$PIDF"
            fi
        fi
    elif tunnel_up; then
        echo "$(date -u +%FT%TZ) tunnel port open; settling 60s"
        sleep 60
        if tunnel_up && ! chain_alive; then
            if grep -q "R3-CHAIN5-DONE" "$LOG" 2>/dev/null; then
                echo "$(date -u +%FT%TZ) chain5 already completed; idle"
            else
                echo "$(date -u +%FT%TZ) launching chain5"
                nohup python scripts/run_r3_chain5.py >> "$LOG" 2>&1 &
                echo $! > "$PIDF"
            fi
        fi
    fi
    sleep 60
done
