#!/bin/bash
# Round-3 chain, part D: post-GMG-coarse-fix validation.  Ordered by value:
# the bs=3 solve (stalled at 3000 its pre-fix) first, then the AMG+BELL
# contact runs, then the big-N ladder.  Same robustness protocol as part C:
# wait for the tunnel before every step, retry infra (UNAVAILABLE) failures,
# yield the single host core to test runs flagged via /tmp/cpu_busy.
cd /root/repo
L=/tmp/tpu_chain_r3.log
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
    while [ -e /tmp/cpu_busy ]; do sleep 30; done
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

step "bench-bs3-n64-r3d"    7200 env BENCH_BS=3 python bench.py
step "bench-deg1-n64-r3d"   3600 python bench.py
step "bench-deg2-n64-r3d"   7200 env BENCH_DEGREE=2 python bench.py
step "contact-smoke"        3600 python benchmarks/bench_contact_3D.py --nb 24 --nt 20 --seg 25 --out /tmp/contact_smoke.txt
step "contact-1M"          12000 python benchmarks/bench_contact_3D.py --nb 58 --nt 50 --seg 25 --out /tmp/contact_1M.txt
step "bench-deg1-n128"      7200 env BENCH_N=128 python bench.py
step "bench-deg2-n108"     10800 env BENCH_DEGREE=2 BENCH_N=108 python bench.py
step "bench-deg1-n216"     10800 env BENCH_N=216 BENCH_XCHUNKS=27 python bench.py
echo "CHAIN D DONE $(date +%H:%M:%S)" >> $L
