"""FLOP accounting and MFU for the train step (VERDICT r4 item 3).

Primary source: XLA's own cost model on the *compiled* program
(``jax.stages.Compiled.cost_analysis()['flops']``) — counts the optimized
HLO, so rematerialization and fusion waste are included.  Cross-check: the
analytic convolution count in :func:`analytic_generator_forward_flops`
(scripts/mfu_report.py compares both on the same program).

Peak numbers are the per-chip dense bf16/fp16 matrix peaks from Google's
published TPU specs; MFU is reported against the bf16 peak (the model's
conv stacks run in bfloat16, gif_tpu/train/config.py ``compute_dtype``).
"""

from __future__ import annotations

from typing import Optional

# Dense bf16 TFLOP/s per chip (MXU peak).
PEAK_FLOPS_BF16 = {
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
    "TPU v5p": 459e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v3": 123e12,
    "TPU v2": 46e12,
}


def device_peak_flops(device=None) -> Optional[float]:
    """Per-chip dense bf16 peak for the active device, None when unknown
    (e.g. the CPU test platform)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    # Longest-prefix match ("TPU v5 lite" must not hit "TPU v5").
    best = None
    for k, v in PEAK_FLOPS_BF16.items():
        if kind.startswith(k) and (best is None or len(k) > best[0]):
            best = (len(k), v)
    return best[1] if best else None


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of one invocation per XLA's cost model, or None when the
    backend doesn't expose cost analysis (lowering is cheap; the executable
    is compiled once and cached alongside the caller's own jit cache)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = ca.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def mfu(flops_per_step: float, steps_per_sec: float, device=None) -> Optional[float]:
    """Model FLOPs utilization in [0, 1] against the chip's bf16 peak."""
    peak = device_peak_flops(device)
    if not peak or not flops_per_step:
        return None
    return flops_per_step * steps_per_sec / peak


def analytic_generator_forward_flops(cfg, batch: int) -> float:
    """Analytic conv/matmul FLOPs of ONE generator forward (multiply+add =
    2 FLOPs), mirroring the synthesis structure of
    gif_tpu/models/generator.py: per scale 4..max_size, two modulated 3x3
    convs + the 3-conv condition-injection nets + a 1x1 ToRGB, plus the
    z->w mapping MLP.  Used as the cross-check on
    :func:`compiled_flops` (scripts/mfu_report.py); small terms
    (demodulation, upfirdn blur taps, biases) are deliberately ignored.
    """
    import math

    def ch(res_log2: int) -> int:
        # models/generator.py channel map: 512 down to 32 at 256px, capped.
        raw = {2: 512, 3: 512, 4: 512, 5: 512, 6: 256 * cfg.channel_multiplier,
               7: 128 * cfg.channel_multiplier, 8: 64 * cfg.channel_multiplier,
               9: 32 * cfg.channel_multiplier, 10: 16 * cfg.channel_multiplier}
        return min(raw[res_log2], cfg.max_channels)

    style_dim = 512
    total = 0.0
    # Mapping MLP: nmlp layers of 512x512 per sample.
    total += 2.0 * batch * cfg.nmlp_for_z_to_w * style_dim * style_dim
    max_log2 = int(math.log2(cfg.max_size))
    cond_c = cfg.cond_channels
    for log2res in range(2, max_log2 + 1):
        res = 2 ** log2res
        c_in = ch(log2res if log2res == 2 else log2res - 1)
        c_out = ch(log2res)
        hw = res * res
        if log2res > 2:
            # Upsampling StyledConv: stride-2 conv_transpose — each INPUT
            # pixel (hw/4 of them) contributes k*k MACs per channel pair.
            total += 2.0 * batch * (hw / 4) * c_in * c_out * 9
        total += 2.0 * batch * hw * c_out * c_out * 9
        # Style->scale EqualLinear per conv: style_dim x c_in.
        total += 2.0 * batch * style_dim * (c_in + c_out)
        # Condition-injection conv nets (NoiseInjection re-design,
        # models/layers.py): per StyledConv a 3-layer conv stack
        # cond_c -> 2*cond_c -> 4*cond_c -> c_out at this resolution.
        n_inject = 1 if log2res == 2 else 2
        inj = (
            hw * cond_c * (2 * cond_c) * 9
            + hw * (2 * cond_c) * (4 * cond_c) * 9
            + hw * (4 * cond_c) * c_out * 9
        )
        total += 2.0 * batch * n_inject * inj
        # ToRGB 1x1.
        total += 2.0 * batch * hw * c_out * 3
    return total
