#!/bin/bash
# Round-3 chain, part E (final validation): re-runs that were pending on
# tunnel availability at the end of part D.  Ordered by value: bs=3 solve
# (auto-omega fix), degree-2 solve (post-hoist), contact smoke then 1M
# (BELL SpMV + smoothed-aggregation AMG), then the big-N ladder.
cd /root/repo
L=/tmp/tpu_chain_r3e.log
S=/tmp/step_cur.log

wait_tunnel() {
  local i=0
  while true; do
    if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    i=$((i + 1))
    if [ $((i % 10)) -eq 1 ]; then
      echo "  [tunnel down, probe $i, $(date +%H:%M:%S)]" >> $L
    fi
    sleep 60
  done
}

step() {
  local name=$1 to=$2
  shift 2
  local attempt
  for attempt in 1 2 3; do
    wait_tunnel
    echo "===== STEP: $name attempt $attempt ($(date +%H:%M:%S)) =====" >> $L
    timeout "$to" "$@" > $S 2>&1
    local rc=$?
    cat $S >> $L
    echo "----- exit: $rc ($(date +%H:%M:%S)) -----" >> $L
    [ $rc -eq 0 ] && return 0
    grep -q "UNAVAILABLE" $S || return $rc
  done
  return 1
}

step "bench-bs3-n64-r3e"    7200 env BENCH_BS=3 python bench.py
step "bench-deg2-n64-r3e"   7200 env BENCH_DEGREE=2 python bench.py
step "contact-smoke-r3e"    3600 python benchmarks/bench_contact_3D.py --nb 24 --nt 20 --seg 25 --out /tmp/contact_smoke.txt
step "contact-1M-r3e"      12000 python benchmarks/bench_contact_3D.py --nb 58 --nt 50 --seg 25 --out /tmp/contact_1M.txt
step "bench-deg1-n128-r3e"  7200 env BENCH_N=128 python bench.py
step "bench-deg2-n108-r3e" 10800 env BENCH_DEGREE=2 BENCH_N=108 python bench.py
step "bench-deg1-n216-r3e" 10800 env BENCH_N=216 BENCH_XCHUNKS=27 python bench.py
echo "CHAIN E DONE $(date +%H:%M:%S)" >> $L
