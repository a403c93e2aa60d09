#!/bin/bash
# Supervises the flagship chip run: the shared TPU's worker process can
# crash ("UNAVAILABLE: TPU worker process crashed or restarted") under
# co-tenancy; training is preemption-safe (training/preempt.py +
# CheckpointManager), so the correct response is resume-from-checkpoint
# with the SAME command. Bounded retries so a deterministic crash loop
# stops instead of burning the chip.
set -u
cd /root/repo
LOG=runs/flagship_r3_sup.log
MAX_RETRIES=${MAX_RETRIES:-6}

# Phase 0: warm the compile cache (recipes/warmup_cache.py). Warming is
# monotonic — every attempt persists at least the program whose compile
# it reached — so retry the crash signature until it completes.
n=0
while [ "$n" -le "$MAX_RETRIES" ]; do
  echo "[sup] warmup attempt $((n+1)) $(date -u +%H:%M:%S)" >> "$LOG"
  python recipes/warmup_cache.py \
    recipes/LibriSpeech/branchformer_summarymixing.yaml \
    --train-manifest corpora/hard27h/manifest_train.csv \
    --valid-manifest corpora/hard27h/manifest_dev.csv \
    --test-manifest corpora/hard27h/manifest_test.csv \
    --output runs/flagship_r3 --num-buckets 8 --beam \
    --set training.number_of_epochs=25 \
    >> "$LOG" 2>&1
  rc=$?
  echo "[sup] warmup exited rc=$rc $(date -u +%H:%M:%S)" >> "$LOG"
  [ "$rc" -eq 0 ] && break
  if ! tail -40 "$LOG" | grep -q "TPU worker process crashed"; then
    echo "[sup] warmup non-crash failure; NOT retrying" >> "$LOG"
    exit "$rc"
  fi
  n=$((n+1))
  sleep 30
done

n=0
while [ "$n" -le "$MAX_RETRIES" ]; do
  echo "[sup] attempt $((n+1)) $(date -u +%H:%M:%S)" >> "$LOG"
  python recipes/train.py recipes/LibriSpeech/branchformer_summarymixing.yaml \
    --train-manifest corpora/hard27h/manifest_train.csv \
    --valid-manifest corpora/hard27h/manifest_dev.csv \
    --test-manifest corpora/hard27h/manifest_test.csv \
    --output runs/flagship_r3 --num-buckets 8 \
    --set training.number_of_epochs=25 \
    >> "$LOG" 2>&1
  rc=$?
  echo "[sup] train.py exited rc=$rc $(date -u +%H:%M:%S)" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    # a preemption-stop (SIGTERM / --max-hours) also exits 0 after
    # checkpointing; that is a request to RESUME, not completion
    if tail -5 "$LOG" | grep -q "\[preempt\]"; then
      echo "[sup] preemption stop; resuming" >> "$LOG"
      sleep 10
      continue
    fi
    echo "[sup] run complete" >> "$LOG"
    exit 0
  fi
  # only retry on the TPU-worker crash signature; anything else is a
  # real bug and must surface
  if ! tail -40 "$LOG" | grep -q "TPU worker process crashed"; then
    echo "[sup] non-crash failure; NOT retrying" >> "$LOG"
    exit "$rc"
  fi
  n=$((n+1))
  sleep 60
done
echo "[sup] gave up after $MAX_RETRIES crash retries" >> "$LOG"
exit 1
