"""Audio frontend numerics tests.

The STFT conventions (centering, reflect pad, periodic hamming window,
window zero-padding to n_fft) are golden-tested against torch.stft, which is
an independent implementation of the exact conventions
torchaudio.transforms.MFCC uses internally (reference:
Envs/audioLoader.py:149-158). The DCT stage is cross-checked against
scipy.fft.dct(type=2, norm='ortho'). The 'gemm' MXU path must agree with the
'fft' path to tight tolerance.
"""
import numpy as np
import pytest
import scipy.fft
import torch

import jax.numpy as jnp

from var_tpu.ops import audio


def _rand_wav(rng, n, scale=0.5):
    return (rng.randn(n) * scale).astype(np.float32)


@pytest.mark.parametrize("dataset", ["GoogleCommand", "NSynth"])
def test_stft_power_matches_torch(dataset):
    params = audio.PARAM_TABLE[dataset]
    rng = np.random.RandomState(0)
    wav = _rand_wav(rng, 16000)

    spec = torch.stft(
        torch.from_numpy(wav),
        n_fft=params.n_fft,
        hop_length=params.hop_length,
        win_length=params.win_length,
        window=torch.hamming_window(params.win_length),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    golden = (spec.abs() ** 2).numpy().T  # (T, n_freqs)

    ours = np.asarray(audio._stft_power_fft(jnp.asarray(wav[None]), params))[0]
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)

    ours_gemm = np.asarray(audio._stft_power_gemm(jnp.asarray(wav[None]), params))[0]
    np.testing.assert_allclose(ours_gemm, golden, rtol=2e-3, atol=2e-3)


def test_gemm_path_matches_fft_path():
    params = audio.PARAM_TABLE["GoogleCommand"]
    rng = np.random.RandomState(1)
    wav = jnp.asarray(np.stack([_rand_wav(rng, 16000) for _ in range(4)]))
    a = np.asarray(audio.mfcc_batch(wav, params, backend="fft"))
    b = np.asarray(audio.mfcc_batch(wav, params, backend="gemm"))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_dct_matches_scipy():
    dct = audio.dct_matrix(audio.N_MFCC, audio.N_MELS)  # (n_mels, n_mfcc)
    rng = np.random.RandomState(2)
    x = rng.randn(5, audio.N_MELS)
    golden = scipy.fft.dct(x, type=2, norm="ortho", axis=-1)[:, : audio.N_MFCC]
    np.testing.assert_allclose(x @ dct, golden, rtol=1e-6, atol=1e-6)


def test_mel_filterbank_properties():
    fb = audio.mel_filterbank(257, 40, 16000)
    assert fb.shape == (257, 40)
    assert np.all(fb >= 0)
    # each filter is a triangle with a single maximum and unit-free scale
    assert np.all(fb.max(axis=0) > 0)
    # HTK mel spot checks: mel(700 Hz) = 2595*log10(2)
    np.testing.assert_allclose(
        audio.hz_to_mel_htk(700.0), 2595.0 * np.log10(2.0), rtol=1e-9
    )
    np.testing.assert_allclose(audio.mel_to_hz_htk(audio.hz_to_mel_htk(441.0)), 441.0)
    # filters tile the spectrum: interior bins are covered
    coverage = fb.sum(axis=1)
    assert np.all(coverage[10:250] > 0)


def test_hamming_window_matches_torch():
    for n in (400, 800):
        ours = audio.hamming_window(n)
        golden = torch.hamming_window(n).numpy()
        np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-7)


def test_frame_count_matches_torch():
    params = audio.PARAM_TABLE["GoogleCommand"]
    for L in (15987, 16000, 400, 1000):
        wav = torch.zeros(L)
        spec = torch.stft(
            wav, n_fft=params.n_fft, hop_length=params.hop_length,
            win_length=params.win_length,
            window=torch.hamming_window(params.win_length),
            center=True, pad_mode="constant", return_complex=True,
        )
        assert audio.num_frames(L, params.hop_length) == spec.shape[1]


def test_sound_features_masking_and_padding():
    params = audio.PARAM_TABLE["GoogleCommand"]
    rng = np.random.RandomState(3)
    L_max = 16000
    buf_len = L_max + params.n_fft
    full = _rand_wav(rng, L_max)
    short_len = 8000

    wav = jnp.asarray(
        np.stack(
            [
                audio.pack_waveform(full, buf_len, params.n_fft),
                audio.pack_waveform(full[:short_len], buf_len, params.n_fft),
            ]
        )
    )
    lengths = jnp.asarray([L_max, short_len], dtype=jnp.int32)
    out = np.asarray(
        audio.sound_features(wav, lengths, target_frames=100, params=params)
    )
    assert out.shape == (2, 1, 100, 40)

    # both rows must equal the per-clip MFCC computed alone, zero-padded
    solo_full = audio.process_sound_feat(audio.mfcc_single(full, params), 100)[0]
    np.testing.assert_allclose(out[0, 0], solo_full, rtol=1e-3, atol=1e-3)
    solo = audio.mfcc_single(full[:short_len], params)
    solo = audio.process_sound_feat(solo, 100)[0]
    np.testing.assert_allclose(out[1, 0], solo, rtol=1e-3, atol=1e-3)
    # frames past the short clip's frame count are exactly zero
    n_valid = audio.num_frames(short_len, params.hop_length)
    assert np.all(out[1, 0, n_valid:] == 0.0)


def test_zero_mask_produces_zero_features():
    params = audio.PARAM_TABLE["GoogleCommand"]
    rng = np.random.RandomState(4)
    buf = audio.pack_waveform(_rand_wav(rng, 16000), 16000 + params.n_fft, params.n_fft)
    wav = jnp.asarray(np.stack([buf] * 2))
    lengths = jnp.asarray([16000, 16000], dtype=jnp.int32)
    out = np.asarray(
        audio.sound_features(
            wav, lengths, 100, params, zero_mask=jnp.asarray([False, True])
        )
    )
    assert np.any(out[0] != 0)
    assert np.all(out[1] == 0)


def test_numpy_host_backend_matches_device_path():
    params = audio.PARAM_TABLE["GoogleCommand"]
    rng = np.random.RandomState(7)
    wav = (rng.randn(12345) * 0.3).astype(np.float32)
    a = audio._mfcc_numpy(wav, params)
    b = np.asarray(audio.mfcc_batch(jnp.asarray(wav[None]), params,
                                    backend="fft"))[0]
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_int16_scaling_matches_reference():
    # reference: audioSamples / 32768. (Envs/audioLoader.py:152-153)
    params = audio.PARAM_TABLE["GoogleCommand"]
    rng = np.random.RandomState(5)
    wav_i16 = (rng.randn(16000) * 8000).astype(np.int16)
    a = audio.mfcc_single(wav_i16, params)
    b = audio.mfcc_single((wav_i16 / 32768.0).astype(np.float32), params)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
