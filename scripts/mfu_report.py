#!/usr/bin/env python
"""MFU / FLOP accounting report (VERDICT r4 item 3).

Prints, for the bench (run_id 8, R1 every step) and flagship (run_id 0)
train steps plus a bare generator forward:

- XLA cost-model FLOPs of the compiled program (the primary number the
  bench's ``mfu`` field uses);
- the analytic conv-count cross-check for the generator forward
  (gif_tpu/utils/flops.py::analytic_generator_forward_flops);
- MFU at a given measured imgs/sec (pass --imgs_per_sec from the latest
  BENCH/FLAGSHIP artifact).

Usage:
    python scripts/mfu_report.py                     # flop table only
    python scripts/mfu_report.py --imgs_per_sec 70.4 --run_id 8
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_id", type=int, default=8)
    ap.add_argument("--imgs_per_sec", type=float, default=None)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gif_tpu.train import get_config, create_train_state, make_train_step
    from gif_tpu.train.state import build_models
    from gif_tpu.flame.resources import synthetic_flame_resources
    from gif_tpu.utils.cache import enable_compilation_cache
    from gif_tpu.utils.flops import (
        analytic_generator_forward_flops,
        compiled_flops,
        device_peak_flops,
    )

    enable_compilation_cache()
    batch = args.batch
    kwargs = {"r1_interval": 1} if args.run_id == 8 else {}
    cfg = get_config(args.run_id, embedding_vocab_size=1024,
                     batch_size=batch, **kwargs)
    res = synthetic_flame_resources()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    cap = 512 if args.run_id == 8 else None
    step_fn = make_train_step(cfg, res, max_tris_per_tile=cap, donate=False)

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

    step_flops = compiled_flops(step_fn, state, data, key)

    # Bare generator forward, same static config as inside the step.
    gen, _ = build_models(cfg)
    cond = jnp.zeros((batch, cfg.max_size, cfg.max_size, cfg.cond_channels))

    def g_fwd(g_params, buffers, cond, indices):
        return gen.apply(
            {"params": g_params, "buffers": buffers}, cond,
            input_indices=indices, step=cfg.max_step,
        )

    g_flops = compiled_flops(
        jax.jit(g_fwd), state.g_params, state.buffers, cond, data["indices"]
    )
    g_analytic = analytic_generator_forward_flops(cfg, batch)

    peak = device_peak_flops()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}  peak(bf16): "
          f"{peak / 1e12 if peak else float('nan'):.0f} TFLOP/s")
    print(f"run_id {cfg.run_id} train step (compiled): "
          f"{step_flops / 1e12 if step_flops else float('nan'):.3f} TFLOP")
    if g_flops:
        print(f"generator fwd  (compiled): {g_flops / 1e12:.3f} TFLOP")
    print(f"generator fwd  (analytic):  {g_analytic / 1e12:.3f} TFLOP")
    if g_flops:
        print(f"cross-check compiled/analytic: {g_flops / g_analytic:.2f}x")
    if step_flops and g_flops:
        print(f"step/g_fwd ratio: {step_flops / g_flops:.1f}x")
    if args.imgs_per_sec and step_flops and peak:
        steps_per_sec = args.imgs_per_sec / batch
        mfu = step_flops * steps_per_sec / peak
        print(f"MFU @ {args.imgs_per_sec} imgs/s: {mfu * 100:.2f}%")
    if step_flops is None:
        print("cost_analysis unavailable on this backend", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
