#!/bin/bash
# Round-5 end-of-training eval battery: the compact, timeout-bounded
# sequence of chip jobs that turns the night's trained checkpoints into
# RESULTS.md rows. Run AFTER the transducer supervisor releases the chip
# (one chip, one job at a time; each job is independently resumable by
# rerunning the script — completed stages are skipped via their output
# marker file).
#
# Stages (priority order; a crash in one does not block the next):
#   1. transducer OFFLINE greedy WER on dev800      (VERDICT r4 task #1)
#   2. transducer STREAMING greedy WER on dev800    (task #1: the pair)
#   3. branchformer beam-10 dev800                  (task #3: beam_programs fix)
#   4. branchformer greedy dev800 base + act_int8   (task #6: WER delta)
#   5. int8_decode_bench                            (task #6: throughput)
#   6. beam_bench --beam 66 rerun                   (task #7: evidence)
#   7. rtf_sweep rerun                              (task #7: evidence)
set -u
cd /root/repo
EV=benchmarks/evidence
mkdir -p "$EV" runs
TD=recipes/LibriSpeech/conformer_summarymixing_transducer.yaml
BF=recipes/LibriSpeech/branchformer_summarymixing.yaml
DEV800=corpora/hard26h/manifest_dev800.csv

run_stage() {  # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  local log="$EV/${name}.log"
  if [ -e "$EV/${name}.done" ]; then echo "[battery] $name: done, skip"; return; fi
  echo "[battery] $name start $(date -u +%H:%M:%S)"
  if timeout "$tmo" "$@" > "$log" 2>&1; then
    touch "$EV/${name}.done"
    echo "[battery] $name OK $(date -u +%H:%M:%S)"
  else
    echo "[battery] $name FAILED rc=$? $(date -u +%H:%M:%S) (log: $log)"
  fi
}

run_stage td_offline_dev800 3000 \
  python -u recipes/evaluate.py "$TD" --test-manifest "$DEV800" \
    --ckpt runs/transducer_r5/save --set training.num_buckets=4 --output runs/td_offline_dev800

run_stage td_streaming_dev800 3000 \
  python -u recipes/evaluate.py "$TD" --test-manifest "$DEV800" \
    --ckpt runs/transducer_r5/save --set training.num_buckets=4 --streaming --chunk-size 16 \
    --left-context 4 --output runs/td_streaming_dev800

run_stage bf_beam10_dev800 3000 \
  python -u recipes/evaluate.py "$BF" --test-manifest "$DEV800" \
    --ckpt runs/flagship_r4/save --beam --set training.num_buckets=4 \
    --set decoding.test_beam_size=10 --set decoding.test_temperature=1.0 \
    --output runs/bf_beam10_dev800

run_stage bf_greedy_dev800 1800 \
  python -u recipes/evaluate.py "$BF" --test-manifest "$DEV800" \
    --ckpt runs/flagship_r4/save --set training.num_buckets=4 --output runs/bf_greedy_dev800

run_stage bf_greedy_int8_dev800 1800 \
  python -u recipes/evaluate.py "$BF" --test-manifest "$DEV800" \
    --ckpt runs/flagship_r4/save --set training.num_buckets=4 --set model.act_int8=true \
    --output runs/bf_greedy_int8_dev800

run_stage int8_decode_bench 1200 \
  python -u benchmarks/int8_decode_bench.py --batch 8 --secs 20

run_stage beam66_r5 2400 \
  python -u benchmarks/beam_bench.py --beam 66 --compare --peaky-blank 0.9

run_stage rtf_sweep_r5 2400 \
  python -u benchmarks/rtf_sweep.py --lengths 10 30 60 100 120

# --- task #2: the reference test protocol at dev200 scale -------------
# TransformerLM (reference 768d/12L) trained on the corpus LM text with
# the flagship run's tokenizer, then beam-66 + avg-3 (the 8 retained generations span the whole warmup;
# averaging step-178 weights with step-2110 would poison the average --
# avg-3 covers steps 1101,1557,2110, the converged tail) + LM-fused decode
# (reference yaml:61,141-142,258-269). dev200 keeps the wall bounded on
# the shared chip; full-dev is the same program at more batches.
run_stage train_lm 3000 \
  python -u recipes/train_lm.py "$BF" --text corpora/hard26h/lm_text.txt \
    --tokenizer-dir runs/flagship_r4 --output runs/flagship_r4/lm \
    --steps 600

run_stage bf_beam66_avg3_dev200 3000 \
  python -u recipes/evaluate.py "$BF" --test-manifest runs/dev200.csv \
    --ckpt runs/flagship_r4/save --beam --avg 3 --set training.num_buckets=4 \
    --output runs/bf_beam66_avg3_dev200

run_stage bf_beam66_avg3_lm_dev200 3000 \
  python -u recipes/evaluate.py "$BF" --test-manifest runs/dev200.csv \
    --ckpt runs/flagship_r4/save --beam --avg 3 --set training.num_buckets=4 \
    --lm-ckpt runs/flagship_r4/lm \
    --output runs/bf_beam66_avg3_lm_dev200

echo "[battery] all stages attempted $(date -u +%H:%M:%S)"
