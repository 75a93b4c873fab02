#!/bin/bash
# Round-3 chain, part B: waits for the TPU tunnel to come back, then runs
# the remaining/re-run steps (auto-omega bs3 solve, hoisted blocked SpMV
# deg2, contact with fixed BELL, big-N ladder).  ONE TPU process at a time.
cd /root/repo
L=/tmp/tpu_chain_r3.log
step() {
  echo "===== STEP: $1 ($(date +%H:%M:%S)) =====" >> $L
  shift
  timeout "$1" "${@:2}" >> $L 2>&1
  echo "----- exit: $? ($(date +%H:%M:%S)) -----" >> $L
}
echo "===== CHAIN B: waiting for tunnel ($(date +%H:%M:%S)) =====" >> $L
for i in $(seq 1 720); do  # up to 6h, probe every 30s
  if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel back at $(date +%H:%M:%S) (probe $i)" >> $L
    break
  fi
  sleep 30
done
step "bench-deg1-n64-r2"   3600 python bench.py
step "bench-deg2-n64-r2"   7200 env BENCH_DEGREE=2 python bench.py
step "bench-bs3-n64-r2"    7200 env BENCH_BS=3 python bench.py
step "contact-smoke"       3600 python benchmarks/bench_contact_3D.py --nb 24 --nt 20 --seg 25 --out /tmp/contact_smoke.txt
step "contact-1M"          9000 python benchmarks/bench_contact_3D.py --nb 58 --nt 50 --seg 25 --out /tmp/contact_1M.txt
step "bench-deg1-n128"     7200 env BENCH_N=128 python bench.py
step "bench-deg2-n108"    10800 env BENCH_DEGREE=2 BENCH_N=108 python bench.py
step "bench-deg1-n216"    10800 env BENCH_N=216 BENCH_XCHUNKS=27 python bench.py
echo "CHAIN B DONE $(date +%H:%M:%S)" >> $L
