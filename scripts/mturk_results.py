#!/usr/bin/env python
"""Perceptual-study batch CSVs and result analysis/plots.

Completes the study pipeline around scripts/mturk_stimuli.py, re-creating
the reference's CSV/plot tail:

- ``csv`` mode — HIT input CSVs from a stimulus directory:
  * association study: one ``image_url`` column
    (mturk/style_flame_disentanglement/generate_csv.py);
  * comparison study: ``GT, OPTION1, OPTION2`` columns with the two models
    randomly swapped left/right per row and the swap key saved
    (mturk/comparison_among_different_models/create_csv.py:26-45).
- ``score`` mode — detection probability of the full model in an A/B
  result CSV, un-doing the left/right swap
  (plot_model_comparison.py:12-26), plus a bar chart across ablations.
- ``likert`` mode — per-identity modal score histogram from 5-point Likert
  association results (plot_results.py / plot_histogram_results.py).

  python scripts/mturk_results.py csv --study comparison \
      --stimulus_dir study_out --base_url https://bucket/ --out batch.csv
"""

import argparse
import csv
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LIKERT = [
    "Strongly disagree",
    "Disagree",
    "Neither agree nor disagree",
    "Agree",
    "Strongly agree",
]


def comparison_rows(names, base_url, rng):
    """(rows, swapped) — per stimulus: mesh URL + the two model images with
    a random left/right swap (create_csv.py:28-39)."""
    rows, swapped = [], []
    for n in names:
        swap = bool(rng.integers(0, 2))
        a = f"{base_url}model_a/{n}"
        b = f"{base_url}model_b/{n}"
        rows.append(
            {
                "GT": f"{base_url}renders/{n}",
                "OPTION1": b if swap else a,
                "OPTION2": a if swap else b,
            }
        )
        swapped.append(swap)
    return rows, swapped


def score_comparison(result_rows):
    """Fraction of answers that picked model A (the full model), given rows
    with OPTION1/answer1 columns; the A-image is identified by its URL
    containing ``model_a`` (plot_model_comparison.py:12-26)."""
    correct = 0
    for r in result_rows:
        ans1 = str(r["answer1"]).strip().lower() in ("1", "true", "yes")
        if ("model_a" in r["OPTION1"]) == ans1:
            correct += 1
    return correct / max(1, len(result_rows))


def likert_modal_scores(result_rows):
    """Per-identity modal 1..5 rating (plot_results.py:23-50)."""
    per_id = defaultdict(list)
    cat_idx = {c: i + 1 for i, c in enumerate(LIKERT)}
    for r in result_rows:
        ident = os.path.basename(r["image_url"]).split("_")[0]
        per_id[ident].append(cat_idx[r["label"]])
    return {
        k: int(np.bincount(v).argmax()) for k, v in sorted(per_id.items())
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["csv", "score", "likert"])
    p.add_argument("--study", choices=["association", "comparison"],
                   default="association")
    p.add_argument("--stimulus_dir", type=str, default="study_out")
    p.add_argument("--base_url", type=str, default="https://example.com/study/")
    p.add_argument("--results", type=str, default=None,
                   help="downloaded result CSV (score / likert modes)")
    p.add_argument(
        "--out",
        type=str,
        default=None,
        help="output path; defaults to batch.csv (csv mode) or "
        "<mode>_plot.png (score/likert modes — matplotlib figures)",
    )
    p.add_argument("--seed", type=int, default=2)  # create_csv.py:24
    args = p.parse_args()
    if args.out is None:
        # csv mode writes a HIT batch CSV; score/likert write matplotlib
        # figures (savefig rejects a .csv extension).
        args.out = "batch.csv" if args.mode == "csv" else f"{args.mode}_plot.png"

    if args.mode == "csv":
        sub = "faces" if args.study == "association" else "model_a"
        names = sorted(os.listdir(os.path.join(args.stimulus_dir, sub)))
        rng = np.random.default_rng(args.seed)
        if args.study == "association":
            rows = [{"image_url": f"{args.base_url}faces/{n}"} for n in names]
        else:
            rows, swapped = comparison_rows(names, args.base_url, rng)
            with open(args.out + ".key.json", "w") as f:
                json.dump({"swapped": swapped}, f)
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} rows to {args.out}")
        return

    with open(args.results, newline="") as f:
        result_rows = list(csv.DictReader(f))

    if args.mode == "score":
        prob = score_comparison(result_rows)
        print(f"full-model detection probability: {prob:.3f}")
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.bar(["full model"], [prob])
        plt.axhline(0.5, ls="--", c="gray")
        plt.ylabel("detection probability")
        plt.savefig(args.out)
        print(f"wrote {args.out}")
    else:
        scores = likert_modal_scores(result_rows)
        for k, v in scores.items():
            print(f"{k}: {v}")
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.hist(list(scores.values()), bins=np.arange(0.5, 6), rwidth=0.8)
        plt.xlabel("modal Likert score")
        plt.ylabel("#identities")
        plt.savefig(args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
