"""Pallas TPU kernel: fused mel -> log -> DCT over the power spectrogram.

The post-FFT half of the MFCC frontend as a single VMEM-resident kernel:
for each batch element, power (T, F) stays on-chip through

    mel_spec = power @ mel_fb        (MXU)
    log_mel  = log(mel_spec + 1e-6)  (VPU)
    mfcc     = log_mel @ dct         (MXU)

avoiding two HBM round-trips between the three ops. Numerics identical to
ops.audio.mfcc_from_power (same constant matrices).

Grid: one program per batch element. Block shapes are padded to the
float32 (8, 128) tile internally by Mosaic; T in {100, 600} and F in
{257, 513} are fine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .audio import LOG_EPS, _frontend_constants, STFTParams


@functools.partial(jax.jit, static_argnums=(1, 2))
def _mel_log_dct(power: jnp.ndarray, params: STFTParams,
                 interpret: bool) -> jnp.ndarray:
    _, _, mel, dct, _, _ = _frontend_constants(params, "float32")
    B, T, F = power.shape
    n_mels, n_mfcc = dct.shape
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mels, n_mfcc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, n_mfcc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(power_ref, mel_ref, dct_ref, out_ref):
        p = power_ref[0]  # (T, F)
        mel_spec = jnp.dot(p, mel_ref[:], preferred_element_type=jnp.float32)
        log_mel = jnp.log(mel_spec + LOG_EPS)
        out_ref[0] = jnp.dot(log_mel, dct_ref[:],
                             preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, n_mfcc), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * F * n_mels + 2 * B * T * n_mels * n_mfcc,
            bytes_accessed=4 * B * T * (F + n_mfcc),
            transcendentals=B * T * n_mels,
        ),
    )(power.astype(jnp.float32), jnp.asarray(mel), jnp.asarray(dct))


def mel_log_dct_pallas(power: jnp.ndarray, params: STFTParams,
                       interpret: bool | None = None) -> jnp.ndarray:
    """power (B, T, F) -> mfcc (B, T, 40). interpret=None auto-selects
    interpreter mode off-TPU (tests on the CPU platform)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _mel_log_dct(power, params, interpret)
