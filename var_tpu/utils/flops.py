"""XLA cost analysis -> FLOPs/step and model-FLOP-utilization (MFU).

The reference publishes no FLOP numbers at all (SURVEY.md §6: no
benchmarks directory); our bench reports relative throughput vs a
torch-CPU twin. This module grounds those numbers against hardware
peak: every benched program gets `flops_per_step` from XLA's own cost
model (`jit(fn).lower(...).compile().cost_analysis()`) and an MFU
figure = achieved FLOP/s over the chip's peak matmul throughput.

Peak table notes: TPU v5e (aka "v5 lite") peaks at ~197 TFLOP/s in
bf16 on the MXU (public spec). The VAR workloads here run f32, which
the MXU executes via multi-pass bf16 passes, so MFU against the bf16
peak is a conservative lower bound. Small-model RL/pretext programs
are expected to sit far below peak (latency/HBM-bound) — the point of
reporting MFU is to make that visible, not to flatter it.
"""
from __future__ import annotations

from typing import Optional

# device -> peak dense-matmul FLOP/s (bf16). Matched by substring of
# jax.devices()[0].device_kind, first hit wins. Peaks are PER JAX
# DEVICE: on v2/v3 each JAX device is one TensorCore (half a chip), so
# those entries are half the per-chip number; v4+ expose one megacore
# device per chip. The bare "v5" entry is a fallback for stacks that
# report v5p as just "TPU v5" (must sort after the specific v5 names).
PEAK_FLOPS_BF16 = (
    ("v5 lite", 197e12),   # TPU v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v5", 459e12),        # some stacks report v5p as plain "TPU v5"
    ("v4", 275e12),
    ("v6 lite", 918e12),   # Trillium
    ("v6e", 918e12),
    ("v3", 61.5e12),       # per TensorCore (123 TFLOP/s per chip)
    ("v2", 22.5e12),       # per TensorCore (45 TFLOP/s per chip)
)

# device -> peak HBM bandwidth (bytes/s), same matching rules. Used for
# the roofline bound: a program with arithmetic intensity AI flops/byte
# cannot exceed min(peak_flops, AI * hbm_peak) regardless of tuning, so
# pct_of_roofline — achieved/bound — separates "this program is small
# and bandwidth-bound by nature" from "this program is leaving hardware
# on the table".
PEAK_HBM_BPS = (
    ("v5 lite", 819e9),
    ("v5e", 819e9),
    ("v5p", 2765e9),
    ("v5", 2765e9),
    ("v4", 1228e9),
    ("v6 lite", 1638e9),
    ("v6e", 1638e9),
    ("v3", 450e9),         # per TensorCore (900 GB/s per chip)
    ("v2", 350e9),
)


def device_peak_hbm(device=None) -> Optional[float]:
    import jax

    if device is None:
        devices = jax.devices()
        if not devices:
            return None
        device = devices[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in PEAK_HBM_BPS:
        if key in kind:
            return peak
    return None


def device_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s for the given (default: first) device, or None
    when the chip isn't in the table (e.g. the CPU test platform)."""
    import jax

    if device is None:
        devices = jax.devices()
        if not devices:
            return None
        device = devices[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in PEAK_FLOPS_BF16:
        if key in kind:
            return peak
    return None


def jit_cost(jitted, *args, **kwargs) -> Optional[dict]:
    """FLOPs + HBM bytes for one invocation of a jitted callable with
    these example args, from XLA's compiled cost analysis. For bound
    methods wrapped with `functools.partial(jax.jit, static_argnums=0)`,
    pass the unbound class attribute and the instance as the first arg.
    Returns None when the backend exposes no cost model."""
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if ca is None:
        return None
    if isinstance(ca, (list, tuple)):  # older jax returned [dict]
        ca = ca[0] if ca else {}
    flops = ca.get("flops")
    if flops is None or flops <= 0:
        return None
    out = {"flops": float(flops)}
    b = ca.get("bytes accessed")
    if b is not None:
        out["bytes_accessed"] = float(b)
    return out


def program_report(jitted, args, step_seconds: float,
                   steps_per_call: int = 1,
                   items_per_call: Optional[int] = None) -> Optional[dict]:
    """Cost + utilization report for one benched program.

    `step_seconds` is the measured wall time of ONE step (call time /
    steps_per_call). Returns flops_per_step, achieved TFLOP/s, and
    mfu_pct (vs the chip's bf16 peak; None off-TPU)."""
    cost = jit_cost(jitted, *args)
    if cost is None:
        return None
    flops_step = cost["flops"] / max(1, steps_per_call)
    rep = {"flops_per_step": round(flops_step)}
    if items_per_call:
        rep["flops_per_item"] = round(cost["flops"] / items_per_call)
    if "bytes_accessed" in cost:
        rep["hbm_bytes_per_step"] = round(
            cost["bytes_accessed"] / max(1, steps_per_call))
    if step_seconds and step_seconds > 0:
        achieved = flops_step / step_seconds
        rep["tflops_per_sec"] = round(achieved / 1e12, 4)
        peak = device_peak_flops()
        if peak:
            rep["mfu_pct"] = round(100.0 * achieved / peak, 3)
        # arithmetic intensity + HBM-roofline utilization: small-model
        # RL programs are bandwidth-bound, so %-of-HBM-peak is the
        # honest utilization axis for them (v5e HBM ~819 GB/s)
        if "bytes_accessed" in cost and step_seconds > 0:
            bytes_step = cost["bytes_accessed"] / max(1, steps_per_call)
            bw = bytes_step / step_seconds
            rep["hbm_gbps"] = round(bw / 1e9, 2)
            # roofline: with AI flops/byte the program cannot beat
            # min(compute peak, AI * HBM peak); pct_of_roofline says how
            # much of the remaining gap is addressable by tuning (high
            # pct = the program IS at its size-imposed ceiling; low pct
            # = launch/latency overhead dominates and batching/fusion
            # can still win)
            hbm_peak = device_peak_hbm()
            peak = device_peak_flops()
            if hbm_peak and peak and bytes_step > 0:
                ai = flops_step / bytes_step
                bound = min(peak, ai * hbm_peak)
                rep["ai_flops_per_byte"] = round(ai, 2)
                rep["roofline_bound_tflops"] = round(bound / 1e12, 3)
                rep["pct_of_roofline"] = round(100.0 * achieved / bound, 2)
    return rep
