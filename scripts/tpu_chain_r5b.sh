#!/bin/bash
# Round-5 chain B: deg2 + bs3 configs at HEAD — validates the round-5
# gmg/amg changes on-chip and exercises the shipped warm caches.
cd /root/repo
L=/tmp/tpu_chain_r5b.log
S=/tmp/step_cur_r5b.log
step() {
  local name=$1 to=$2
  shift 2
  for attempt in 1 2 3; do
    echo "===== STEP: $name attempt $attempt ($(date +%H:%M:%S)) =====" >> $L
    timeout "$to" "$@" > $S 2>&1
    local rc=$?
    grep -vE "cpu_aot_loader|SIGILL|UserWarning|truncated to dtype" $S >> $L
    echo "----- exit: $rc ($(date +%H:%M:%S)) -----" >> $L
    cp $L /root/repo/benchmarks/logs/tpu_chain_r5b.log
    [ $rc -eq 0 ] && return 0
    grep -q "UNAVAILABLE" $S || return $rc
  done
  return 1
}
step "bench-deg2-n64-r5b" 3600 env BENCH_DEGREE=2 python bench.py
step "bench-bs3-n64-r5b"  3600 env BENCH_BS=3 python bench.py
echo "CHAIN R5B DONE $(date +%H:%M:%S)" >> $L
cp $L /root/repo/benchmarks/logs/tpu_chain_r5b.log
