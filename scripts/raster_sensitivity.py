"""Renderer-numerics sensitivity experiment (VERDICT r3 weak #4 / next #5).

The reference renderer lives in a submodule that is absent upstream
(SURVEY.md fact #1), so pixel-level render parity is unprovable.  This
experiment bounds what that uncertainty can DO to training: run the real
training loop twice with identical seeds — once with the XLA rasterizer,
once with the Pallas kernel (the two implementations differ only in
numerics/z-ties) — plus a same-backend control arm with a different seed,
and compare loss trajectories.  The claim to validate: the backend-induced
divergence is at or below seed-level noise, i.e. renderer numerics are not
a training-relevant degree of freedom.

Usage (hardware, ~4 min/arm at 300 iters):
    python scripts/raster_sensitivity.py --iters 300 --out_dir /tmp/rsens
CPU smoke (tiny debug config, interpret-mode Pallas raster — slow per
iter, keep --iters small):
    python scripts/raster_sensitivity.py --iters 6 --debug --log_every 2

Writes ``raster_sensitivity.json`` into --out_dir:
    {"divergence": mean |xla - pallas| over logged d/g losses,
     "noise_floor": mean |xla(seed) - xla(seed')| over the same rows,
     "ratio": divergence / noise_floor}
"""

import argparse
import csv
import json
import os
import subprocess
import sys

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def run_arm(tag, backend, seed, args):
    out = os.path.join(args.out_dir, tag)
    metrics = os.path.join(out, str(args.run_id), "metrics.csv")
    want_rows = args.iters // args.log_every
    if os.path.exists(metrics) and len(read_losses(metrics)) >= want_rows:
        # Resumable: a completed arm (e.g. from a run the TPU tunnel killed
        # partway) is reused as-is.
        print(f"[{tag}] complete, skipping")
        return metrics
    env = dict(os.environ, GIF_TPU_RASTER=backend)
    cmd = [
        sys.executable, os.path.join(_REPO, "train.py"),
        "--run_id", str(args.run_id),
        "--total_iters", str(args.iters),
        "--out_dir", out,
        "--seed", str(seed),
        "--log_every", str(args.log_every),
        "--no_mesh",
    ]
    if args.debug:
        cmd.append("--debug")
    for attempt in (1, 2):
        if os.path.exists(out):
            # A partial arm must restart clean: metrics.csv appends, and
            # duplicated early rows would misalign the row-wise comparison.
            import shutil

            shutil.rmtree(out)
        print(f"[{tag}] backend={backend} seed={seed} (attempt {attempt})")
        if subprocess.run(cmd, env=env, cwd=_REPO).returncode == 0:
            return metrics
    raise SystemExit(f"arm {tag} failed twice (transient-tunnel retry cover)")


def read_losses(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return [(float(r["d_loss"]), float(r["g_loss"])) for r in rows]


def mean_abs_diff(a, b):
    n = min(len(a), len(b))
    if n == 0:
        raise SystemExit("no logged rows — lower --log_every or raise --iters")
    return sum(
        abs(x[0] - y[0]) + abs(x[1] - y[1]) for x, y in zip(a[:n], b[:n])
    ) / (2 * n)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_id", type=int, default=8)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--out_dir", default="/tmp/raster_sensitivity")
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--max_ratio", type=float, default=None,
                   help="fail if divergence/noise_floor exceeds this")
    args = p.parse_args()

    a = read_losses(run_arm("xla", "xla", args.seed, args))
    b = read_losses(run_arm("pallas", "pallas", args.seed, args))
    c = read_losses(run_arm("xla_reseed", "xla", args.seed + 1, args))

    result = {
        "divergence": mean_abs_diff(a, b),
        "noise_floor": mean_abs_diff(a, c),
        "iters": args.iters,
        "rows": min(len(a), len(b), len(c)),
    }
    result["ratio"] = (
        result["divergence"] / result["noise_floor"]
        if result["noise_floor"] > 0 else float("inf")
    )
    out = os.path.join(args.out_dir, "raster_sensitivity.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if args.max_ratio is not None and result["ratio"] > args.max_ratio:
        raise SystemExit(
            f"raster-backend divergence {result['divergence']:.4f} exceeds "
            f"{args.max_ratio}x the seed noise floor {result['noise_floor']:.4f}"
        )


if __name__ == "__main__":
    main()
