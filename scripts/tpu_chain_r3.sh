#!/bin/bash
# Round-3 serialized TPU validation chain (ONE TPU process at a time).
# Logs to /tmp/tpu_chain_r3.log; each step tagged, failures don't stop the chain.
# Benches run FIRST (an earlier chain ran a pathological 15GB BELL conversion
# before the n=64 bench and the page-cache/memory pressure inflated its host
# setup 132s); smokes and big configs after.
cd /root/repo
L=/tmp/tpu_chain_r3.log
step() {
  echo "===== STEP: $1 ($(date +%H:%M:%S)) =====" >> $L
  shift
  timeout "$1" "${@:2}" >> $L 2>&1
  echo "----- exit: $? ($(date +%H:%M:%S)) -----" >> $L
}
: > $L
step "bench-deg1-n64"     3600 python bench.py
step "bench-deg2-n64"     7200 env BENCH_DEGREE=2 python bench.py
step "bench-bs3-n64"      7200 env BENCH_BS=3 python bench.py
step "bell-smoke-1M"      1200 python scripts/tpu_bell_smoke.py 1000000
step "contact-smoke"      3600 python benchmarks/bench_contact_3D.py --nb 24 --nt 20 --seg 25 --out /tmp/contact_smoke.txt
step "contact-1M"         9000 python benchmarks/bench_contact_3D.py --nb 58 --nt 50 --seg 25 --out /tmp/contact_1M.txt
step "bench-deg1-n128"    7200 env BENCH_N=128 python bench.py
step "bench-deg2-n108"   10800 env BENCH_DEGREE=2 BENCH_N=108 python bench.py
step "bench-deg1-n216"   10800 env BENCH_N=216 BENCH_XCHUNKS=27 python bench.py
echo "CHAIN DONE $(date +%H:%M:%S)" >> $L
