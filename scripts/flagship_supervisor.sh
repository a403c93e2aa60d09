#!/bin/bash
# Supervises the flagship chip run: the shared TPU's worker process can
# crash ("UNAVAILABLE: TPU worker process crashed or restarted") under
# co-tenancy; training is preemption-safe (training/preempt.py +
# CheckpointManager), so the correct response is resume-from-checkpoint
# with the SAME command. Bounded retries so a deterministic crash loop
# stops instead of burning the chip.
#
# Env knobs (all optional):
#   DEADLINE_TS  epoch-seconds wall deadline; each attempt gets
#                --max-hours of the remaining budget and the loop stops
#                resuming once < 120 s remain (a deliberately bounded
#                session still ends with a clean checkpoint + eval).
#   RECIPE       recipe yaml (default the branchformer flagship; set to
#                recipes/LibriSpeech/conformer_summarymixing_transducer.yaml
#                for the streaming-transducer flagship)
#   EPOCHS       training.number_of_epochs override   (default 25)
#   NUM_BUCKETS  --num-buckets                        (default 8)
#   CORPUS       corpus dir with manifest_{train,dev,test}.csv
#                                                     (default corpora/hard26h)
#   TRAIN_MANIFEST / VALID_MANIFEST  override the per-split manifest
#                paths (default $CORPUS/manifest_{train,dev}.csv) — e.g.
#                a subset manifest so epochs (and hence per-epoch valid
#                WER points) fit a degraded co-tenancy window
#   OUT          run dir                              (default runs/flagship_r4)
#   LOG          supervisor log                       (default $OUT_sup.log)
#   EXTRA_SET    extra --set overrides, space-separated KEY=VALUE pairs
#                (e.g. "training.n_warmup_steps=2500")
#   SKIP_WARMUP  1 = skip the phase-0 AOT warmup; train.py compiles
#                lazily through the same persistent cache, so warming
#                only front-loads (it never saves) compile time.
set -u
cd /root/repo
MAX_RETRIES=${MAX_RETRIES:-6}
RECIPE=${RECIPE:-recipes/LibriSpeech/branchformer_summarymixing.yaml}
EPOCHS=${EPOCHS:-25}
NUM_BUCKETS=${NUM_BUCKETS:-8}
CORPUS=${CORPUS:-corpora/hard26h}
OUT=${OUT:-runs/flagship_r4}
LOG=${LOG:-${OUT}_sup.log}
DEADLINE_TS=${DEADLINE_TS:-}
SKIP_WARMUP=${SKIP_WARMUP:-0}
EXTRA_SET=${EXTRA_SET:-}
TRAIN_MANIFEST=${TRAIN_MANIFEST:-$CORPUS/manifest_train.csv}
VALID_MANIFEST=${VALID_MANIFEST:-$CORPUS/manifest_dev.csv}

mkdir -p "$OUT"   # pidfile is written before train.py creates it

SET_ARGS=(--set training.number_of_epochs="$EPOCHS")
for kv in $EXTRA_SET; do
  SET_ARGS+=(--set "$kv")
done

remaining_hours() {
  # prints remaining budget in hours (blank = unbounded)
  if [ -n "$DEADLINE_TS" ]; then
    python3 -c "import time; print(max(0.0, ($DEADLINE_TS - time.time()) / 3600))"
  fi
}

have_checkpoint() {
  # any orbax step dir under $OUT/save?
  ls -d "$OUT"/save/*/ >/dev/null 2>&1
}

# Phase 0: warm the compile cache (recipes/warmup_cache.py). Warming is
# monotonic — every attempt persists at least the program whose compile
# it reached — so retry the crash signature until it completes.
if [ "$SKIP_WARMUP" != "1" ]; then
  n=0
  while [ "$n" -le "$MAX_RETRIES" ]; do
    echo "[sup] warmup attempt $((n+1)) $(date -u +%H:%M:%S)" >> "$LOG"
    python recipes/warmup_cache.py \
      "$RECIPE" \
      --train-manifest "$TRAIN_MANIFEST" \
      --valid-manifest "$VALID_MANIFEST" \
      --test-manifest "$CORPUS"/manifest_test.csv \
      --output "$OUT" --num-buckets "$NUM_BUCKETS" --beam \
      "${SET_ARGS[@]}" \
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
fi

n=0        # crash-retry budget (bounded)
attempt=0  # total launches, incl. preemption resumes (log labels only)
while [ "$n" -le "$MAX_RETRIES" ]; do
  HOURS_ARGS=()
  rem=$(remaining_hours)
  if [ -n "$rem" ]; then
    if python3 -c "import sys; sys.exit(0 if $rem < 0.034 else 1)"; then
      if have_checkpoint; then
        echo "[sup] deadline reached; stopping with last checkpoint" >> "$LOG"
      else
        echo "[sup] deadline reached; NO checkpoint was written" >> "$LOG"
      fi
      exit 0
    fi
    HOURS_ARGS=(--max-hours "$rem")
  fi
  attempt=$((attempt+1))
  echo "[sup] attempt $attempt (crash-retries used: $n) $(date -u +%H:%M:%S) budget_h=${rem:-inf}" >> "$LOG"
  # pidfile so a preemption drill can SIGTERM the exact train.py process
  # (never kill-by-pattern: CLAUDE.md)
  python recipes/train.py "$RECIPE" \
    --train-manifest "$TRAIN_MANIFEST" \
    --valid-manifest "$VALID_MANIFEST" \
    --test-manifest "$CORPUS"/manifest_test.csv \
    --output "$OUT" --num-buckets "$NUM_BUCKETS" \
    "${HOURS_ARGS[@]}" \
    "${SET_ARGS[@]}" \
    >> "$LOG" 2>&1 &
  echo $! > "$OUT/train.pid"
  wait $!
  rc=$?
  rm -f "$OUT/train.pid"
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
