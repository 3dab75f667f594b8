#!/bin/bash
# Sequential TPU job queue (one TPU process at a time).  Stop: touch .exp/qstop
cd /root/repo
run() {
  name=$1; shift
  if [ -f .exp/qstop ]; then echo "qstop before $name"; exit 0; fi
  echo "=== $name start $(date -u +%FT%TZ)" >> .exp/queue_r3.log
  "$@" > ".exp/${name}.out" 2> ".exp/${name}.err" < /dev/null
  echo "=== $name rc=$? end $(date -u +%FT%TZ)" >> .exp/queue_r3.log
}
run agg64_phases env PHASES=1 timeout 5500 python .exp/agg_tpu_bench.py 64
run parity timeout 5500 python .exp/tpu_device_parity.py
run mxu_f64_18 timeout 5400 python .exp/mxu_f64_ab.py 18 12
run fib_f128_18 timeout 5500 python .exp/fib_limb_bench.py f128 18
run agg256 timeout 5500 python .exp/agg_tpu_bench.py 256
