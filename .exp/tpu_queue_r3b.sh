#!/bin/bash
# Follow-up TPU queue: waits for tpu_queue_r3.sh to finish, then runs.
cd /root/repo
while pgrep -f "tpu_queue_r3.sh" | grep -v $$ > /dev/null; do sleep 60; done
run() {
  name=$1; shift
  if [ -f .exp/qstop ]; then echo "qstop before $name" >> .exp/queue_r3.log; exit 0; fi
  echo "=== $name start $(date -u +%FT%TZ)" >> .exp/queue_r3.log
  "$@" > ".exp/${name}.out" 2> ".exp/${name}.err" < /dev/null
  echo "=== $name rc=$? end $(date -u +%FT%TZ)" >> .exp/queue_r3.log
}
run mxu_f64_18b timeout 5400 python .exp/mxu_f64_ab.py 18 12
run agg64b env PHASES=1 timeout 5500 python .exp/agg_tpu_bench.py 64
run rescue20b env LOG_N=20 timeout 5400 python .exp/rescue20_profile.py
