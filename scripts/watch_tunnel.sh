#!/bin/bash
# Watch for the axon tunnel relay to come back (port 8082 accepting), then
# launch the round-3 resume chain ONCE. Written during the 2026-08-17 19:27
# tunnel outage; safe to re-run — refuses if the chain already started.
cd /root/repo
if [ -f /tmp/r3_chain4.pid ] && kill -0 "$(cat /tmp/r3_chain4.pid)" 2>/dev/null; then
    echo "chain4 already running ($(cat /tmp/r3_chain4.pid))"
    exit 0
fi
echo "watching for tunnel on 127.0.0.1:8082 ..."
while true; do
    if timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; then
        echo "$(date -u +%FT%TZ) tunnel port open; settling 60s"
        sleep 60
        # double-check it is still up
        if timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; then
            echo "$(date -u +%FT%TZ) launching chain4"
            nohup python scripts/run_r3_chain4.py > results/r3_chain4.log 2>&1 &
            echo $! > /tmp/r3_chain4.pid
            exit 0
        fi
    fi
    sleep 60
done
