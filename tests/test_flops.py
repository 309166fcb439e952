"""XLA cost-analysis utilities (utils/flops.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.utils import flops


def test_jit_cost_matmul():
    f = jax.jit(lambda a, b: a @ b)
    x = jnp.ones((64, 64), jnp.float32)
    cost = flops.jit_cost(f, x, x)
    if cost is None:  # backend without a cost model: tolerated
        return
    # 2*M*N*K FLOPs for a matmul
    assert cost["flops"] >= 2 * 64 * 64 * 64


def test_program_report_fields():
    f = jax.jit(lambda a: a * 2.0 + 1.0)
    x = jnp.ones((128,), jnp.float32)
    rep = flops.program_report(f, (x,), step_seconds=1e-3,
                               steps_per_call=1, items_per_call=128)
    if rep is None:
        return
    assert rep["flops_per_step"] > 0
    assert "tflops_per_sec" in rep
    assert rep["flops_per_item"] * 128 >= rep["flops_per_step"]


def test_device_peak_lookup():
    # unknown kinds -> None; table kinds -> positive floats
    assert flops.device_peak_flops() is None or \
        flops.device_peak_flops() > 0
    for _, peak in flops.PEAK_FLOPS_BF16:
        assert peak > 1e13
