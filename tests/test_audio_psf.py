"""python_speech_features-semantics MFCC backend (ops/audio.py::mfcc_psf).

The reference's get_mfcc second branch (Envs/audioLoader.py:159-162) calls
python_speech_features.mfcc(raw_int16, fs, winlen, winstep, numcep=40,
nfilt=40, nfft, winfunc=np.hamming). These tests pin the twin's stage
semantics analytically; the direct golden comparison activates wherever the
real library installs (it is not in this image).
"""
import math

import numpy as np
import pytest

from var_tpu.ops.audio import STFTParams, mfcc_psf, psf_filterbank

P = STFTParams(512, 400, 160)  # GoogleCommand preset at 16 kHz


def _wav(n, seed=0, scale=3000.0):
    return (np.random.RandomState(seed).randn(n) * scale).astype(np.int16)


def test_frame_count_ceil_with_tail_pad():
    # psf framesig: 1 frame when slen <= frame_len, else 1 + ceil((slen -
    # frame_len)/step) with a zero tail pad (not torchaudio's centered
    # 1 + slen//hop)
    assert mfcc_psf(_wav(400), P).shape == (1, 40)
    assert mfcc_psf(_wav(401), P).shape == (2, 40)
    assert mfcc_psf(_wav(16000), P).shape == (99, 40)
    n = 7777
    expect = 1 + math.ceil((n - 400) / 160)
    assert mfcc_psf(_wav(n), P).shape == (expect, 40)


def test_c0_is_log_total_energy_and_tracks_amplitude():
    # appendEnergy replaces coefficient 0 with log(sum |rfft|^2 / NFFT);
    # doubling the waveform scales every frame's power by 4 -> c0 shifts
    # by exactly log(4) while nothing else about framing changes
    wav = np.random.RandomState(1).randn(4000) * 1000.0
    a = mfcc_psf(wav, P)
    b = mfcc_psf(2.0 * wav, P)
    np.testing.assert_allclose(b[:, 0] - a[:, 0], np.log(4.0), atol=1e-4)


def test_lifter_curve():
    # with appendEnergy off, disabling the lifter must divide each column
    # by 1 + (L/2) sin(pi n / L)
    wav = _wav(3000, seed=2)
    lifted = mfcc_psf(wav, P, append_energy=False)
    plain = mfcc_psf(wav, P, append_energy=False, ceplifter=0)
    n = np.arange(40)
    lift = 1.0 + 11.0 * np.sin(np.pi * n / 22.0)
    np.testing.assert_allclose(lifted, plain * lift, rtol=1e-5, atol=1e-5)


def test_raw_int16_amplitudes_not_rescaled():
    # the reference feeds int16 WITHOUT /32768 on this branch
    # (audioLoader.py:159 passes audioSamples straight through); the twin
    # must see raw amplitudes: c0 of an int16 clip sits log(32768^2) above
    # the same clip pre-scaled to float
    wav = _wav(2000, seed=3)
    raw = mfcc_psf(wav, P)
    scaled = mfcc_psf(wav.astype(np.float64) / 32768.0, P)
    np.testing.assert_allclose(
        raw[:, 0] - scaled[:, 0], 2.0 * np.log(32768.0), atol=1e-4)


def test_filterbank_floor_binned_triangles():
    fb = psf_filterbank(40, 512, 16000)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all() and fb.max() <= 1.0
    # floor-binned triangles peak at exactly 1 at bin[j+1] whenever the
    # triangle is non-degenerate; every filter's support is contiguous
    for j in range(40):
        nz = np.flatnonzero(fb[j])
        if len(nz):
            assert np.array_equal(nz, np.arange(nz[0], nz[-1] + 1))


def test_preemphasis_changes_spectrum_not_framing():
    wav = _wav(3200, seed=4)
    a = mfcc_psf(wav, P, preemph=0.97)
    b = mfcc_psf(wav, P, preemph=0.0)
    assert a.shape == b.shape
    assert not np.allclose(a, b)


def test_store_get_mfcc_dispatch():
    from var_tpu.config import main_config
    from var_tpu.data.audio_store import AudioStore

    cfg = main_config(env="arms")
    store = AudioStore(cfg)
    clip = _wav(5000, seed=5)
    psf = store.get_mfcc(clip, P, mfcc_from="python_speech_features")
    ta = store.get_mfcc(clip, P, mfcc_from="torchaudio")
    assert psf.shape == (1, cfg.sound_dim[1], 40)
    assert ta.shape == (1, cfg.sound_dim[1], 40)
    # the two conventions are genuinely different pipelines
    assert not np.allclose(psf, ta, atol=1.0)


def test_golden_vs_python_speech_features():
    psf_lib = pytest.importorskip("python_speech_features")
    wav = _wav(9000, seed=6)
    ours = mfcc_psf(wav, P)
    theirs = psf_lib.mfcc(
        wav, 16000, winlen=400 / 16000, winstep=160 / 16000, numcep=40,
        nfilt=40, nfft=512, winfunc=np.hamming)
    np.testing.assert_allclose(ours, theirs.astype(np.float32),
                               rtol=1e-4, atol=1e-4)
