#!/bin/bash
# Round-5 contact chain (VERDICT r4 next #4): smoke with the new --split
# instrumentation, then the 1M-dof BASELINE config twice back-to-back —
# the second invocation runs with warm persistent compile caches, proving
# (or refuting) that the r4 artifact's 507 s assemble / 427 s pc-setup
# walls were one-time compile + host-aggregation costs.
cd /root/repo
L=/tmp/contact_chain_r5.log
S=/tmp/contact_step_r5.log

wait_tunnel() {
  local i=0
  while true; do
    if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    i=$((i + 1))
    [ $((i % 10)) -eq 1 ] && echo "  [tunnel down, probe $i, $(date +%H:%M:%S)]" >> $L
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
    cp $L /root/repo/benchmarks/logs/contact_chain_r5.log
    [ $rc -eq 0 ] && return 0
    grep -q "UNAVAILABLE" $S || return $rc
  done
  return 1
}

step "contact-smoke-split-r5" 3600 python benchmarks/bench_contact_3D.py \
  --nb 24 --nt 20 --seg 25 --split --out benchmarks/logs/contact_smoke_r5.txt
step "contact-1M-runA-r5" 5400 python benchmarks/bench_contact_3D.py \
  --nb 58 --nt 50 --seg 25 --out benchmarks/logs/contact_1M_r5_cold.txt
step "contact-1M-runB-warm-split-r5" 5400 python benchmarks/bench_contact_3D.py \
  --nb 58 --nt 50 --seg 25 --split --out benchmarks/logs/contact_1M_r5_warm.txt
echo "CONTACT CHAIN R5 DONE $(date +%H:%M:%S)" >> $L
cp $L /root/repo/benchmarks/logs/contact_chain_r5.log
