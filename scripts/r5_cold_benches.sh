#!/bin/bash
# Round-5 second-session bench chain: the checkpoint-free chip jobs that
# remain runnable after the machine recycle wiped runs/ (see
# benchmarks/RESULTS.md "Machine recycle mid-round"). Waits for the
# in-flight bench.py (pid in /tmp/bench.pid) to release the chip, then
# runs each bench with a hard timeout, logging to benchmarks/evidence/.
# Resumable: completed stages skip via .done markers.
set -u
cd /root/repo
EV=benchmarks/evidence
mkdir -p "$EV"

if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 10; done
fi

run_stage() {  # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  local log="$EV/${name}.log"
  if [ -e "$EV/${name}.done" ]; then echo "[chain] $name: done, skip"; return; fi
  echo "[chain] $name start $(date -u +%H:%M:%S)"
  if timeout "$tmo" "$@" > "$log" 2>&1; then
    touch "$EV/${name}.done"
    echo "[chain] $name OK $(date -u +%H:%M:%S)"
  else
    echo "[chain] $name FAILED rc=$? $(date -u +%H:%M:%S) (log: $log)"
  fi
}

run_stage beam66_r5 2400 \
  python -u benchmarks/beam_bench.py --beam 66 --compare --peaky-blank 0.9
run_stage int8_decode_bench_r5 1500 \
  python -u benchmarks/int8_decode_bench.py --batch 8 --secs 20
run_stage rtf_sweep_r5 2400 \
  python -u benchmarks/rtf_sweep.py --lengths 10 30 60 100 120
echo "[chain] all attempted $(date -u +%H:%M:%S)"
