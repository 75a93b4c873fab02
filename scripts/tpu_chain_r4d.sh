#!/bin/bash
# Round-4 chain, take 4 (fresh container — /tmp and ~/.jax_cache wiped, so
# every step pays its cold remote compile again).  Records the remaining
# north-star rows at HEAD, cheapest-first so partial sessions still land
# useful artifacts: bs=3 n=64 (elasticity its validation), n=128 P1,
# 10.2M P2 (n=108, canonical --degree 2), 10.2M P1 (n=216).
# Log: /tmp/tpu_chain_r4d.log — copied into benchmarks/logs/ after each step.
cd /root/repo
L=/tmp/tpu_chain_r4d.log
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
    grep -vE "cpu_aot_loader|SIGILL|UserWarning|truncated to dtype" $S >> $L
    echo "----- exit: $rc ($(date +%H:%M:%S)) -----" >> $L
    cp $L /root/repo/benchmarks/logs/tpu_chain_r4d.log
    [ $rc -eq 0 ] && return 0
    grep -q "UNAVAILABLE" $S || return $rc
  done
  return 1
}

step "bench-bs3-n64-r4d"     5400 env BENCH_BS=3 python bench.py
step "bench-deg1-n128-r4d"   5400 env BENCH_N=128 python bench.py
step "bench-deg2-n108-r4d"  10800 env BENCH_DEGREE=2 BENCH_N=108 python bench.py
step "bench-deg1-n216-r4d"  10800 env BENCH_N=216 BENCH_XCHUNKS=27 python bench.py
echo "CHAIN R4D DONE $(date +%H:%M:%S)" >> $L
cp $L /root/repo/benchmarks/logs/tpu_chain_r4d.log
