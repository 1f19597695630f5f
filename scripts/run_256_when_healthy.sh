#!/bin/bash
# North-star 256^3 run under the oracle protocol (BASELINE.md: hypre
# 2.20.0 serial oracle = 36 iterations, 125.2 s setup / 230.4 s solve,
# 72.6 kDOF/s on this machine's CPU).  The axon tunnel/compile service
# flaps on minute timescales (GAPS.md), so this retries until a probe
# passes, then runs the real thing and commits the JSON artifact.
#
# Usage: bash scripts/run_256_when_healthy.sh [max_attempts]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-12}
for i in $(seq 1 "$MAX"); do
    echo "[$(date +%H:%M:%S)] attempt $i/$MAX: probing service health..."
    if timeout 120 python scripts/probe_health.py >/tmp/probe256.log 2>&1; then
        echo "[$(date +%H:%M:%S)] healthy — running 256^3 bench"
        if timeout 3600 python bench.py --size 256 --repeats 2 \
            2>/tmp/bench256.err | tail -1 > BENCH_256_r05.json; then
            cat BENCH_256_r05.json
            exit 0
        fi
        echo "bench failed; stderr tail:"; tail -5 /tmp/bench256.err
    fi
    sleep 300
done
echo "no healthy window in $MAX attempts"
exit 1
