#!/bin/bash
# Round-5 chain A: on-chip validation of the transposed-j-factor Mosaic fix,
# then the two configs the r4d chain crashed on (n=128 -> axis 129,
# n=216 -> axis 217 — both past one lane register).  Order matters: the
# probe (9x133x133, cheap) proves the fixed factored kernel lowers on-chip
# BEFORE we spend hours on the 10.2M-dof flagship.
# Log: /tmp/tpu_chain_r5a.log — copied into benchmarks/logs/ after each step.
cd /root/repo
L=/tmp/tpu_chain_r5a.log
S=/tmp/step_cur_r5a.log

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
    cp $L /root/repo/benchmarks/logs/tpu_chain_r5a.log
    [ $rc -eq 0 ] && return 0
    grep -q "UNAVAILABLE" $S || return $rc
  done
  return 1
}

step "probe-factored-wide-r5a"  3600 python scripts/probe_factored_wide.py
step "bench-deg1-n128-r5a"      5400 env BENCH_N=128 python bench.py
step "bench-deg1-n216-r5a"     10800 env BENCH_N=216 BENCH_XCHUNKS=27 python bench.py
echo "CHAIN R5A DONE $(date +%H:%M:%S)" >> $L
cp $L /root/repo/benchmarks/logs/tpu_chain_r5a.log
