"""Benchmark: full GIF train step (G+D fwd-bwd + on-device FLAME render) at
FFHQ-256, batch 16, on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation: the reference publishes no throughput numbers
(BASELINE.md).  The only in-repo cost anecdote is ~17 s/iter at batch 16 with
the gradient penalty applied every iteration (reference train.py:145
comment).  We therefore run the SAME configuration (R1 every iteration,
run_id-8 conditioning, 256px, global batch 16) and report
vs_baseline = imgs_per_sec / (16 / 17).
"""

import argparse
import json
import time

import numpy as np


def main(run_id: int = 8):
    import jax
    import jax.numpy as jnp

    from gif_tpu.train import get_config, create_train_state, make_train_step
    from gif_tpu.flame.resources import synthetic_flame_resources
    from gif_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    batch = 16
    kwargs = {}
    if run_id == 8:
        # Match the 17 s/iter reference anecdote (GP every iteration).
        kwargs["r1_interval"] = 1
    cfg = get_config(
        run_id,  # 8 = both conditions, no interp loss — the GP-cost config
        embedding_vocab_size=1024,
        batch_size=batch,
        **kwargs,
    )
    res = synthetic_flame_resources()

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # run_id 8 pins the historical capacity of the driver-tracked bench line;
    # other configs auto-size from the mesh (guarantees render_overflow == 0).
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
    # Warmup / compile.  NOTE: completion is forced with a host readback of a
    # scalar metric — jax.block_until_ready is a no-op on the experimental
    # axon platform, so naive timing would measure dispatch only.
    state, metrics = step_fn(state, data, key)
    _ = float(metrics["d_loss"])

    # Protocol (VERDICT r3 weak #5): >=3 independent timed chains of 10
    # steps each, each chain closed by a scalar readback that forces the
    # whole dependent computation; report the median chain and the spread
    # so run-to-run noise is visible in the artifact.
    n_iters, n_chains = 10, 3
    rates = []
    for c in range(n_chains):
        t0 = time.perf_counter()
        for i in range(n_iters):
            state, metrics = step_fn(
                state, data, jax.random.fold_in(key, c * n_iters + i)
            )
        _ = float(metrics["d_loss"])  # forces the whole dependent chain
        rates.append(batch * n_iters / (time.perf_counter() - t0))

    imgs_per_sec = float(np.median(rates))
    baseline = 16.0 / 17.0  # imgs/sec from the reference's 17 s/iter anecdote
    metric = "ffhq256_train_imgs_per_sec_per_chip"
    line = {
        "metric": metric if run_id == 8 else f"{metric}_run{run_id}",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / baseline, 2),
        "spread": round(max(rates) - min(rates), 3),
        "chains": [round(r, 3) for r in rates],
    }
    # MFU (VERDICT r4 item 3): FLOPs/step from XLA's cost model on the
    # compiled program (includes remat/fusion waste), against the chip's
    # dense bf16 peak.  The persistent compilation cache makes the extra
    # lower+compile cheap.  scripts/mfu_report.py carries the analytic
    # conv-count cross-check.
    from gif_tpu.utils.flops import compiled_flops, device_peak_flops

    flops_step = compiled_flops(step_fn, state, data, key)
    peak = device_peak_flops()
    if flops_step:
        line["flops_per_step"] = float(f"{flops_step:.4g}")
        if peak:
            line["mfu"] = round(flops_step * (imgs_per_sec / batch) / peak, 4)
    if run_id != 8:
        line["render_overflow"] = float(metrics["render_overflow"])
    print(json.dumps(line))


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--run_id",
        type=int,
        default=8,
        help="training config preset; 8 (default) is the driver-tracked bench "
        "line, 0 is the paper's flagship (texture-interpolation loss)",
    )
    main(ap.parse_args().run_id)
