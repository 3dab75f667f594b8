#!/bin/bash
# Fourth TPU queue: reference-parity Lamport configs (f128 + BLAKE3-192).
cd /root/repo
while pgrep -f "tpu_queue_r3c.sh" | grep -v $$ > /dev/null; do sleep 60; done
run() {
  name=$1; shift
  if [ -f .exp/qstop ]; then echo "qstop before $name" >> .exp/queue_r3.log; exit 0; fi
  echo "=== $name start $(date -u +%FT%TZ)" >> .exp/queue_r3.log
  "$@" > ".exp/${name}.out" 2> ".exp/${name}.err" < /dev/null
  echo "=== $name rc=$? end $(date -u +%FT%TZ)" >> .exp/queue_r3.log
}
run agg64_b192 env HASH=blake3_192 timeout 5500 python .exp/agg_tpu_bench.py 64
run agg1024_b192 env HASH=blake3_192 timeout 5500 python .exp/agg_tpu_bench.py 1024
