"""Profile the bench train step op-by-op on the axon TPU.

Captures a perfetto trace of a few bench-config steps and prints a
per-category / top-op duration table (pid 3 = TPU ops in the axon trace).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py
"""

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np


def run(out_dir="/tmp/gif-profile", n_steps=3, run_id=8):
    import jax
    import jax.numpy as jnp

    from gif_tpu.train import get_config, create_train_state, make_train_step
    from gif_tpu.flame.resources import synthetic_flame_resources

    batch = 16
    # Match bench.py's protocol per run_id: run 8 forces R1 every step (the
    # reference's 17 s/iter anecdote config); other presets (e.g. the run-0
    # flagship with the interp loss) keep their own cadence so the profile
    # is of the program FLAGSHIP_r*.json actually times.
    kwargs = {"r1_interval": 1} if run_id == 8 else {}
    cfg = get_config(run_id, embedding_vocab_size=1024, batch_size=batch, **kwargs)
    res = synthetic_flame_resources()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    cap = 512 if run_id == 8 else None
    step_fn = make_train_step(cfg, res, max_tris_per_tile=cap, donate=True)

    rng = np.random.default_rng(0)
    flame = np.zeros((batch, 236), np.float32)
    flame[:, :100] = rng.standard_normal((batch, 100)).astype(np.float32) * 0.1
    flame[:, 150:156] = rng.standard_normal((batch, 6)).astype(np.float32) * 0.05
    flame[:, 156] = 8.0
    flame[:, 209:212] = 3.0
    data = {
        "real_image": jnp.asarray(
            rng.uniform(-1, 1, (batch, 256, 256, 3)).astype(np.float32)
        ),
        "flame": jnp.asarray(flame),
        "indices": jnp.asarray(rng.integers(0, 1024, batch), jnp.int32),
    }

    key = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, data, key)  # compile/warm
    _ = float(metrics["d_loss"])

    jax.profiler.start_trace(out_dir, create_perfetto_trace=True)
    for i in range(n_steps):
        state, metrics = step_fn(state, data, jax.random.fold_in(key, i))
    _ = float(metrics["d_loss"])
    jax.profiler.stop_trace()
    return out_dir, n_steps


def parse(out_dir, n_steps):
    paths = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no trace under {out_dir}"
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)

    events = [
        e
        for e in tr["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3 and "dur" in e
    ]
    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_meta = {}
    total = 0.0
    for e in events:
        dur = e["dur"] / 1000.0 / n_steps  # us -> ms, per step
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        name = e.get("name", "?")
        by_cat[cat] += dur
        by_op[name] += dur
        if name not in op_meta:
            op_meta[name] = (cat, args.get("long_name", ""))
        total += dur

    print(f"\n=== per-step TPU time: {total:.1f} ms over {len(events)//n_steps} ops ===")
    print("\n--- by category ---")
    for cat, ms in by_cat.most_common():
        print(f"{ms:9.2f} ms  {cat}")
    print("\n--- top 40 ops ---")
    for name, ms in by_op.most_common(40):
        cat, long = op_meta[name]
        print(f"{ms:8.2f} ms  [{cat}] {name}  {long[:140]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--parse-only":
        parse(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    else:
        import argparse

        ap = argparse.ArgumentParser(description=__doc__)
        ap.add_argument("--run_id", type=int, default=8)
        ap.add_argument("--out_dir", default="/tmp/gif-profile")
        a = ap.parse_args()
        out_dir, n = run(out_dir=a.out_dir, run_id=a.run_id)
        parse(out_dir, n)
