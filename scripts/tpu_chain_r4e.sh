#!/bin/bash
# Round-4 chain, take 5: the two configs the r4d chain crashed on — both
# died on the same Mosaic "Unsupported reshape" ((n,) -> (n,1)) in the
# factored assembler, which only triggers for axis sizes > 128 lanes
# (n=128 -> 129, n=216 -> 217; the n<=108 configs fit one lane register).
# Fixed by keeping every kernel slice 2-D (transposed j-factors in
# ops/pallas_lattice.py).  Log: /tmp/tpu_chain_r4e.log — copied into
# benchmarks/logs/ after each step.
cd /root/repo
L=/tmp/tpu_chain_r4e.log
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
    cp $L /root/repo/benchmarks/logs/tpu_chain_r4e.log
    [ $rc -eq 0 ] && return 0
    grep -q "UNAVAILABLE" $S || return $rc
  done
  return 1
}

step "bench-deg1-n128-r4e"   5400 env BENCH_N=128 python bench.py
step "bench-deg1-n216-r4e"  10800 env BENCH_N=216 BENCH_XCHUNKS=27 python bench.py
echo "CHAIN R4E DONE $(date +%H:%M:%S)" >> $L
cp $L /root/repo/benchmarks/logs/tpu_chain_r4e.log
