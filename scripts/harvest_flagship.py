"""Harvest a flagship chip run's train_log.jsonl into a markdown
trajectory table for benchmarks/RESULTS.md (loss / valid WER / beam WER /
step-time vs step — the evidence VERDICT round 2 asked for).

Usage: python scripts/harvest_flagship.py runs/flagship_r3 [--every N]
Prints a markdown table (every Nth epoch plus every epoch that carries a
beam-WER point) and a one-line summary of total steps, wall time, and
mean post-warmup step time.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--every", type=int, default=5)
    args = ap.parse_args()
    if args.every < 1:
        ap.error("--every must be >= 1")

    rows = []
    for path in sorted(glob.glob(os.path.join(args.run_dir, "train_log*.jsonl"))):
        with open(path) as f:
            for line in f:
                rows.append(json.loads(line))
    epochs = [r for r in rows if "epoch" in r.get("meta", {})]
    if not epochs:
        raise SystemExit(f"no epoch rows in {args.run_dir}")

    # steps is cumulative; derive per-epoch step counts + step time
    print("| epoch | steps | train loss | valid loss | valid WER % | "
          "beam WER % | epoch s | s/step |")
    print("|---|---|---|---|---|---|---|---|")
    prev_steps = 0
    printed = set()
    for r in epochs:
        meta, tr, va = r["meta"], r.get("train", {}), r.get("valid", {})
        ep = meta["epoch"]
        n = meta.get("steps", 0) - prev_steps
        beam = va.get("beam_WER")
        keep = (ep % args.every == 0 or ep == 1 or beam is not None
                or r is epochs[-1])
        if keep and ep not in printed:
            printed.add(ep)
            sps = (meta.get("epoch_s", 0.0) / n) if n else 0.0
            print(f"| {ep} | {meta.get('steps', 0)} | "
                  f"{tr.get('loss', float('nan')):.3f} | "
                  f"{va.get('loss', float('nan')):.3f} | "
                  f"{va.get('WER', float('nan')):.2f} | "
                  f"{'' if beam is None else f'{beam:.2f}'} | "
                  f"{meta.get('epoch_s', 0.0):.1f} | {sps:.2f} |")
        prev_steps = meta.get("steps", prev_steps)

    total_steps = epochs[-1]["meta"].get("steps", 0)
    wall = sum(e["meta"].get("epoch_s", 0.0) for e in epochs)
    # post-warmup cadence: skip the first epoch (compile-contaminated);
    # with a single logged epoch there is no post-warmup window — omit
    # the line rather than mislabel the contaminated epoch (ADVICE r3)
    post = epochs[1:]
    post_steps = (post[-1]["meta"].get("steps", 0)
                  - epochs[0]["meta"].get("steps", 0)) if post else 0
    post_wall = sum(e["meta"].get("epoch_s", 0.0) for e in post)
    print(f"\ntotal: {total_steps} steps over {len(epochs)} epochs, "
          f"{wall:.0f} s logged epoch time"
          + (f"; post-warmup {post_wall / post_steps:.2f} s/step"
             if post and post_steps else
             " (single epoch: compile-contaminated, no post-warmup"
             " cadence)" if len(epochs) == 1 else ""))
    tests = [r for r in rows if r.get("meta", {}).get("stage") == "test"]
    for t in tests:
        print("test:", t.get("test"))


if __name__ == "__main__":
    main()
