#!/bin/bash
# Supervise a chip chain across axon relay outages.
#
# usage: watch_tunnel.sh <until_unix_ts>
#   <until_unix_ts>: hard wall deadline (round-end discipline, VERDICT r3
#   next #1b). Launched chains get --until_min recomputed from it, so a
#   relaunch after an outage never runs past the original deadline; once
#   it passes and no chain is alive, the supervisor exits.
#
# Loop:
#   - chain not running + tunnel up (two checks 60 s apart) + deadline
#     >30 min away: launch it. Relaunching is safe — every phase resumes
#     or re-measures idempotently.
#   - chain running + tunnel DOWN + its log stale >30 min: the process is
#     wedged in un-completable device RPCs (observed 2026-08-17 19:27
#     outage; such a process never recovers) — kill it BY PID and re-arm.
#
# Never kills by pattern; only the PID it started ($PIDF). The chain name,
# command, log, and DONE marker live in ONE place below (advisor r3: the
# r3 supervisor grepped a stale marker after a chain rename).
UNTIL_TS=${1:?usage: watch_tunnel.sh <until_unix_ts> [chain]}
cd /root/repo
CHAIN=${2:-r5_chain}
LOG=results/${CHAIN}.log
PIDF=/tmp/${CHAIN}.pid
# r5_chain -> R5-CHAIN-DONE, r5b_chain -> R5B-CHAIN-DONE
DONE_MARKER="$(echo "${CHAIN%_chain}" | tr a-z A-Z)-CHAIN-DONE"
launch_chain() {
    local left_min=$(( ($UNTIL_TS - $(date +%s)) / 60 ))
    nohup python scripts/run_${CHAIN}.py --until_min "$left_min" \
        >> "$LOG" 2>&1 &
    echo $! > "$PIDF"
}

tunnel_up() { timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; }
chain_alive() { [ -f "$PIDF" ] && kill -0 "$(cat "$PIDF")" 2>/dev/null; }

echo "$(date -u +%FT%TZ) supervising $CHAIN until $(date -u -d @$UNTIL_TS +%FT%TZ)"
while true; do
    if chain_alive; then
        if ! tunnel_up && [ -f "$LOG" ]; then
            age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
            if [ "$age" -gt 1800 ]; then
                echo "$(date -u +%FT%TZ) tunnel down and $LOG stale ${age}s:" \
                     "killing wedged $CHAIN pid $(cat "$PIDF")"
                kill "$(cat "$PIDF")" 2>/dev/null
                sleep 10
                kill -9 "$(cat "$PIDF")" 2>/dev/null
                rm -f "$PIDF"
            fi
        fi
    elif grep -q "$DONE_MARKER" "$LOG" 2>/dev/null; then
        echo "$(date -u +%FT%TZ) $CHAIN completed; supervisor exiting"
        exit 0
    elif [ $(( $UNTIL_TS - $(date +%s) )) -lt 1800 ]; then
        echo "$(date -u +%FT%TZ) <30 min to deadline, not relaunching; exiting"
        exit 0
    elif tunnel_up; then
        echo "$(date -u +%FT%TZ) tunnel port open; settling 60s"
        sleep 60
        if tunnel_up && ! chain_alive; then
            echo "$(date -u +%FT%TZ) launching $CHAIN"
            launch_chain
        fi
    fi
    sleep 60
done
