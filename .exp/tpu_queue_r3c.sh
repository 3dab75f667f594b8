#!/bin/bash
# Third TPU queue: waits for r3b, then scaling + limb-field rows.
cd /root/repo
while pgrep -f "tpu_queue_r3b.sh" | grep -v $$ > /dev/null; do sleep 60; done
run() {
  name=$1; shift
  if [ -f .exp/qstop ]; then echo "qstop before $name" >> .exp/queue_r3.log; exit 0; fi
  echo "=== $name start $(date -u +%FT%TZ)" >> .exp/queue_r3.log
  "$@" > ".exp/${name}.out" 2> ".exp/${name}.err" < /dev/null
  echo "=== $name rc=$? end $(date -u +%FT%TZ)" >> .exp/queue_r3.log
}
run rescue_scaling timeout 5400 python .exp/rescue_scaling.py
run fib_f62_18 timeout 5400 python .exp/fib_limb_bench.py f62 18
run fib_f128_20 timeout 5500 python .exp/fib_limb_bench.py f128 20
