#!/bin/bash
# Summary Decoder vs MHA decoder WER matrix, LARGE eval sample
# (VERDICT r3 weak #6 / r4 task #4: the round-3 matrix was 80 utts /
# 440 tokens — rerun with a 10x held-out sample so the comparison has
# resolution). Runs entirely on CPU (JAX_PLATFORMS=cpu) so it never
# co-tenants the flagship chip run. Training protocol matches round 3
# (same step count, same recipes); only the corpus/eval sample is
# bigger: --n 4000 -> 3,200 train / 400 dev / 400 test utterances.
#
# Resume-safe: train.py restores from $out/save and stops at --steps,
# so rerunning after a preemption continues rather than skipping.
set -eu
cd /root/repo
export JAX_PLATFORMS=cpu
LOG=runs/sd_rerun.log

if [ ! -f corpora/hard4k/manifest_train.csv ]; then
  python recipes/make_synthetic_corpus.py corpora/hard4k --hard --n 4000 \
    --lm-text 20000 --seed 0 >> "$LOG" 2>&1
fi

for pair in "hard_synthetic:runs/sd4k" \
            "hard_synthetic_summarydecoder:runs/sd4k_sd"; do
  cfg=${pair%%:*}
  out=${pair##*:}
  echo "[sd] training $cfg -> $out $(date -u +%H:%M:%S)" >> "$LOG"
  python recipes/train.py recipes/Synthetic/${cfg}.yaml \
    --train-manifest corpora/hard4k/manifest_train.csv \
    --valid-manifest corpora/hard4k/manifest_dev.csv \
    --steps 1650 --output "$out" \
    --set training.ckpt_interval_minutes=3 >> "$LOG" 2>&1
done

if [ ! -d runs/sd4k_lm/save ]; then
  echo "[sd] training LM $(date -u +%H:%M:%S)" >> "$LOG"
  python recipes/train_lm.py recipes/Synthetic/hard_synthetic.yaml \
    --text corpora/hard4k/lm_text.txt --tokenizer-dir runs/sd4k \
    --output runs/sd4k_lm --epochs 5 >> "$LOG" 2>&1
fi

# Eval matrix: 2 models x {greedy, beam, beam+LM} x {dev, test}
# (lm_weight 0.2 = the round-3 dev-selected value; avg-10 protocol).
for pair in "hard_synthetic:runs/sd4k" \
            "hard_synthetic_summarydecoder:runs/sd4k_sd"; do
  cfg=${pair%%:*}
  out=${pair##*:}
  tag=$(basename "$out")
  for split in dev test; do
    for decode in greedy beam beamlm; do
      evout=runs/evals_sd4k/${tag}_${decode}_${split}
      [ -f "$evout/eval.json" ] && continue
      ARGS=(recipes/Synthetic/${cfg}.yaml
            --test-manifest corpora/hard4k/manifest_${split}.csv
            --ckpt "$out/save" --avg 10 --output "$evout")
      case $decode in
        beam)   ARGS+=(--beam) ;;
        beamlm) ARGS+=(--beam --lm-ckpt runs/sd4k_lm
                       --set decoding.lm_weight=0.2) ;;
      esac
      echo "[sd] eval $tag $decode $split $(date -u +%H:%M:%S)" >> "$LOG"
      python recipes/evaluate.py "${ARGS[@]}" >> "$LOG" 2>&1
    done
  done
done
echo "[sd] done $(date -u +%H:%M:%S)" >> "$LOG"
