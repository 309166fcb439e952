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

# chip -> peak dense-matmul FLOP/s (bf16). Matched by substring of
# jax.devices()[0].device_kind, first hit wins.
PEAK_FLOPS_BF16 = (
    ("v5 lite", 197e12),   # TPU v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v4", 275e12),
    ("v6 lite", 918e12),   # Trillium
    ("v6e", 918e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


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
            bw = cost["bytes_accessed"] / max(1, steps_per_call) / step_seconds
            rep["hbm_gbps"] = round(bw / 1e9, 2)
    return rep
