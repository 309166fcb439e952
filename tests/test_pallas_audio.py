"""Pallas fused mel->log->DCT kernel vs the XLA reference path."""
import numpy as np

import jax.numpy as jnp

from var_tpu.ops import audio
from var_tpu.ops.audio_pallas import mel_log_dct_pallas


def test_pallas_mel_log_dct_matches_xla():
    params = audio.PARAM_TABLE["GoogleCommand"]
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(3, 16000).astype(np.float32) * 0.2)
    power = audio._stft_power_gemm(wav, params)
    golden = np.asarray(audio.mfcc_from_power(power, params))
    ours = np.asarray(mel_log_dct_pallas(power, params))
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)


def test_pallas_backend_end_to_end():
    params = audio.PARAM_TABLE["GoogleCommand"]
    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.3)
    a = np.asarray(audio.mfcc_batch(wav, params, backend="gemm"))
    b = np.asarray(audio.mfcc_batch(wav, params, backend="pallas"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
