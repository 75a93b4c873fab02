#!/bin/bash
# Round-3 chain, part C: robust re-run chain.  Waits (indefinitely) for the
# TPU tunnel before EVERY step, retries a step up to 3x when it fails with a
# backend-UNAVAILABLE infra error, and never overlaps with the full-pytest
# run that may still hold the single host core.
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

# let any previously-started full pytest run finish first (1 host core)
if [ -f /tmp/pytest.pid ]; then
  while ps -p "$(cat /tmp/pytest.pid)" >/dev/null 2>&1; do sleep 30; done
fi

step() {
  local name=$1 to=$2
  shift 2
  local attempt
  for attempt in 1 2 3; do
    # host-idle gate: while /tmp/cpu_busy exists, another process owns the
    # single host core (test runs) — bench host-setup timings need it idle
    while [ -e /tmp/cpu_busy ]; do sleep 30; done
    wait_tunnel
    echo "===== STEP: $name attempt $attempt ($(date +%H:%M:%S)) =====" >> $L
    timeout "$to" "$@" > $S 2>&1
    local rc=$?
    cat $S >> $L
    echo "----- exit: $rc ($(date +%H:%M:%S)) -----" >> $L
    [ $rc -eq 0 ] && return 0
    # retry only infra failures (tunnel drop / backend init); a real error
    # reproduces and should surface, not loop
    grep -q "UNAVAILABLE" $S || return $rc
  done
  return 1
}

step "bench-deg1-n64-r3c"   3600 python bench.py
step "bench-deg2-n64-r3c"   7200 env BENCH_DEGREE=2 python bench.py
step "bench-bs3-n64-r3c"    7200 env BENCH_BS=3 python bench.py
step "contact-smoke"        3600 python benchmarks/bench_contact_3D.py --nb 24 --nt 20 --seg 25 --out /tmp/contact_smoke.txt
step "contact-1M"           9000 python benchmarks/bench_contact_3D.py --nb 58 --nt 50 --seg 25 --out /tmp/contact_1M.txt
step "bench-deg1-n128"      7200 env BENCH_N=128 python bench.py
step "bench-deg2-n108"     10800 env BENCH_DEGREE=2 BENCH_N=108 python bench.py
step "bench-deg1-n216"     10800 env BENCH_N=216 BENCH_XCHUNKS=27 python bench.py
echo "CHAIN C DONE $(date +%H:%M:%S)" >> $L
