"""TPU-native MFCC audio frontend.

Replaces the reference's per-sample CPU MFCC (torchaudio.transforms.MFCC
inside DataLoader workers and env processes — reference:
Envs/audioLoader.py:147-164, the pretext-throughput bottleneck per
SURVEY.md §3.2) with a batched, jit-compiled device pipeline.

Numerical contract (must match torchaudio.transforms.MFCC with
log_mels=True, n_mfcc=40, n_mels=40, f_min=0, f_max=None,
window_fn=torch.hamming_window within 1e-4):

  wav (int16/32768 float)  ->  STFT power spectrum
      center=True, reflect padding of n_fft//2, hop = windowStepTime*fs,
      win_length = windowLenTime*fs, hamming window (periodic),
      window zero-padded symmetrically to n_fft
  ->  mel filterbank (HTK scale, norm=None, triangular, n_mels=40)
  ->  log(mel + 1e-6)
  ->  DCT-II, 'ortho' norm, n_mfcc=40
  ->  transpose to (frames, 40), pad-or-truncate frames to sound_dim[1],
      leading channel dim -> (1, T, 40)
      (reference: Envs/audioLoader.py:241-252 processSoundFeat)

Two equivalent backends:

* 'fft'  — jnp.fft.rfft over explicitly framed windows. Ground truth.
* 'gemm' — the TPU-first path: the hamming window and the DFT basis are
  folded into a single pair of real matmuls executed as one strided
  convolution over the waveform (framing, windowing, and the Fourier
  transform in one MXU op), followed by two more matmuls (mel, DCT).
  For the short frames used here (400/800 samples) a dense DFT GEMM maps
  onto the 128x128 systolic array far better than an FFT butterfly.

Variable-length clips are handled with static shapes: every batch row is a
fixed-size waveform buffer plus an integer sample length; frames beyond
1 + len//hop are masked to zero, matching the reference's zero-padding of
short features. The "empty intent" class whose feature is literally a zero
matrix (reference: dataset.py:38,51,59) is expressed with a per-row
`zero_mask`.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class STFTParams(NamedTuple):
    """Per-dataset STFT parameters (reference: Envs/audioLoader.py:23-31)."""

    n_fft: int
    win_length: int
    hop_length: int
    sample_rate: int = 16000


# reference: Envs/audioLoader.py:23-31 (times converted at fs=16 kHz)
PARAM_TABLE = {
    "GoogleCommand": STFTParams(512, 400, 160),
    "NSynth": STFTParams(1024, 800, 640),
    "UrbanSound": STFTParams(1024, 800, 640),
    "ESC50": STFTParams(512, 400, 160),
    "FSC": STFTParams(512, 400, 160),
    "Spatial": STFTParams(512, 400, 160),
    "Synthetic": STFTParams(512, 400, 160),
}

N_MFCC = 40
N_MELS = 40
LOG_EPS = 1e-6


def hamming_window(win_length: int, dtype=np.float64) -> np.ndarray:
    """torch.hamming_window(win_length) — periodic, alpha=0.54 beta=0.46."""
    n = np.arange(win_length, dtype=dtype)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int, f_min: float = 0.0, f_max=None
) -> np.ndarray:
    """Triangular mel filterbank, HTK scale, norm=None.

    Matches torchaudio.functional.melscale_fbanks(n_freqs, f_min, f_max,
    n_mels, sample_rate, norm=None, mel_scale='htk'); returns (n_freqs, n_mels).
    """
    f_max = sample_rate / 2.0 if f_max is None else f_max
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """DCT-II basis with 'ortho' norm; returns (n_mels, n_mfcc).

    Matches torchaudio.functional.create_dct(n_mfcc, n_mels, norm='ortho').
    """
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[:, None]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)  # (n_mfcc, n_mels)
    dct[0] *= 1.0 / np.sqrt(2.0)
    dct *= np.sqrt(2.0 / n_mels)
    return dct.T


@functools.lru_cache(maxsize=None)
def _frontend_constants(params: STFTParams, dtype_name: str):
    """Precompute window-folded DFT, mel, and DCT matrices (host, float64)."""
    n_fft, win, _, sr = params
    dtype = np.dtype(dtype_name)
    ham = hamming_window(win)
    # torch.stft zero-pads the window symmetrically to n_fft; the frame
    # slice that actually contributes starts `off` samples into each
    # n_fft-long centered frame.
    off = (n_fft - win) // 2
    n = np.arange(win, dtype=np.float64) + off
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(n, k) / n_fft  # (win, n_freqs)
    w_cos = (ham[:, None] * np.cos(phase)).astype(dtype)
    w_sin = (ham[:, None] * -np.sin(phase)).astype(dtype)
    mel = mel_filterbank(n_fft // 2 + 1, N_MELS, sr).astype(dtype)
    dct = dct_matrix(N_MFCC, N_MELS).astype(dtype)
    ham_padded = np.zeros(n_fft, dtype=dtype)
    ham_padded[off : off + win] = ham
    return w_cos, w_sin, mel, dct, ham_padded, off


def num_frames(num_samples, hop_length: int):
    """Frame count for center=True STFT: 1 + floor(L / hop)."""
    return 1 + num_samples // hop_length


def _reflect_pad_batch(wav: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")


def pack_waveform(clip: np.ndarray, buf_len: int, n_fft: int,
                  keep_int16: bool = False) -> np.ndarray:
    """Host-side packing of one variable-length clip into a fixed buffer.

    Applies the center=True reflect padding at the clip's *true* boundaries
    (n_fft//2 samples each side) so batched framing of the buffer is
    bit-identical to a per-clip STFT — the layout is
    [reflect_left | clip | reflect_right | zeros...]. `buf_len` must be
    >= len(clip) + n_fft.

    keep_int16=True keeps int16 samples (reflection is exact on integers);
    the device pipeline then applies the /32768 scaling after transfer,
    halving host->device bandwidth.
    """
    clip = np.asarray(clip)
    if keep_int16:
        assert clip.dtype == np.int16
        out_dtype = np.int16
    else:
        if clip.dtype == np.int16:
            clip = (clip / 32768.0).astype(np.float32)
        clip = clip.astype(np.float32)
        out_dtype = np.float32
    pad = n_fft // 2
    L = clip.shape[0]
    if L + 2 * pad > buf_len:
        clip = clip[: buf_len - 2 * pad]
        L = clip.shape[0]
    out = np.zeros(buf_len, dtype=out_dtype)
    padded = np.pad(clip, (pad, pad), mode="reflect")
    out[: L + 2 * pad] = padded
    return out


def _stft_power_fft(
    wav: jnp.ndarray, params: STFTParams, pre_padded: bool = False
) -> jnp.ndarray:
    """Power spectrogram via explicit framing + rfft. wav: (B, L) float."""
    n_fft, _, hop, _ = params
    w_cos, _, _, _, ham_padded, _ = _frontend_constants(params, str(wav.dtype))
    del w_cos
    B, L = wav.shape
    if pre_padded:
        T = num_frames(L - n_fft, hop)
        padded = wav
    else:
        T = num_frames(L, hop)
        padded = _reflect_pad_batch(wav, n_fft // 2)
    starts = np.arange(T) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]  # (T, n_fft)
    frames = padded[:, idx]  # (B, T, n_fft)
    frames = frames * jnp.asarray(ham_padded)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, T, n_freqs)
    return jnp.abs(spec) ** 2


def _stft_power_gemm(
    wav: jnp.ndarray, params: STFTParams, pre_padded: bool = False
) -> jnp.ndarray:
    """Power spectrogram as one strided convolution (framing + window + DFT).

    The two real DFT matrices (window folded in) act as conv filters of
    width win_length and stride hop_length — a single MXU-friendly op.
    """
    n_fft, win, hop, _ = params
    w_cos, w_sin, _, _, _, off = _frontend_constants(params, str(wav.dtype))
    B, L = wav.shape
    if pre_padded:
        T = num_frames(L - n_fft, hop)
        padded = wav
    else:
        T = num_frames(L, hop)
        padded = _reflect_pad_batch(wav, n_fft // 2)
    # Frame t (centered) covers padded[t*hop : t*hop + n_fft]; only the
    # window's support [off, off+win) contributes, so convolve filters of
    # width `win` over padded[off:].
    x = padded[:, off : off + (T - 1) * hop + win]
    filt = jnp.concatenate([jnp.asarray(w_cos), jnp.asarray(w_sin)], axis=1)
    # conv_general_dilated: input (B, 1, L'), filters (out=2F, in=1, win)
    out = jax.lax.conv_general_dilated(
        x[:, None, :],
        jnp.transpose(filt, (1, 0))[:, None, :],
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=wav.dtype,
    )  # (B, 2F, T)
    n_freqs = w_cos.shape[1]
    re, im = out[:, :n_freqs, :], out[:, n_freqs:, :]
    power = re * re + im * im  # (B, F, T)
    return jnp.transpose(power, (0, 2, 1))  # (B, T, F)


def mfcc_from_power(power: jnp.ndarray, params: STFTParams) -> jnp.ndarray:
    """mel -> log -> DCT on a (B, T, n_freqs) power spectrogram."""
    _, _, mel, dct, _, _ = _frontend_constants(params, str(power.dtype))
    mel_spec = power @ jnp.asarray(mel)  # (B, T, n_mels)
    log_mel = jnp.log(mel_spec + LOG_EPS)
    return log_mel @ jnp.asarray(dct)  # (B, T, n_mfcc)


def mfcc_batch(
    wav: jnp.ndarray,
    params: STFTParams,
    backend: str = "gemm",
    pre_padded: bool = False,
) -> jnp.ndarray:
    """MFCC of a batch of equal-length waveforms. wav (B, L) -> (B, T, 40).

    With pre_padded=True, rows are pack_waveform() buffers (reflect padding
    already applied at true clip boundaries).
    """
    if jnp.issubdtype(wav.dtype, jnp.integer):
        # int16 bank rows: normalize here — otherwise the frontend
        # constants would be cast to the integer dtype downstream and the
        # window coefficients truncate to zero (silent garbage)
        wav = wav.astype(jnp.float32) * (1.0 / 32768.0)
    if backend == "fft":
        power = _stft_power_fft(wav, params, pre_padded)
    elif backend == "gemm":
        power = _stft_power_gemm(wav, params, pre_padded)
    elif backend == "pallas":
        from .audio_pallas import mel_log_dct_pallas

        power = _stft_power_gemm(wav, params, pre_padded)
        return mel_log_dct_pallas(power, params)
    else:
        raise ValueError(f"unknown audio backend {backend!r}")
    return mfcc_from_power(power, params)


def sound_features(
    wav: jnp.ndarray,
    lengths: jnp.ndarray,
    target_frames: int,
    params: STFTParams,
    backend: str = "gemm",
    zero_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full frontend: batched MFCC + frame masking + pad/truncate + channel dim.

    Args:
      wav: (B, buf_len) float32 buffers produced by pack_waveform() — each
        row carries its own reflect padding at the clip's true boundaries,
        making batched framing bit-identical to per-clip MFCC.
      lengths: (B,) int32 valid sample counts per row (clip lengths).
      target_frames: config.sound_dim[1] (100 arm / 600 ai2thor).
      zero_mask: optional (B,) bool; True rows produce all-zero features
        (the reference's "empty intent" zero matrix, dataset.py:38).

    Returns (B, 1, target_frames, 40) float features.
    """
    if wav.dtype == jnp.int16:
        wav = wav.astype(jnp.float32) * (1.0 / 32768.0)
    B, L = wav.shape
    T = num_frames(L - params.n_fft, params.hop_length)
    feats = mfcc_batch(wav, params, backend=backend, pre_padded=True)  # (B, T, 40)

    # Mask frames past each clip's true frame count (reference pads the
    # *feature* with zeros — Envs/audioLoader.py:241-252).
    n_valid = num_frames(lengths, params.hop_length)  # (B,)
    frame_ids = jnp.arange(T)[None, :]  # (1, T)
    valid = frame_ids < n_valid[:, None]  # (B, T)
    feats = jnp.where(valid[:, :, None], feats, 0.0)

    # pad-or-truncate the frame axis to target_frames
    if T >= target_frames:
        feats = feats[:, :target_frames, :]
    else:
        feats = jnp.pad(feats, ((0, 0), (0, target_frames - T), (0, 0)))

    if zero_mask is not None:
        feats = jnp.where(zero_mask[:, None, None], 0.0, feats)

    return feats[:, None, :, :]  # (B, 1, T, 40)


def _mfcc_numpy(wav: np.ndarray, params: STFTParams) -> np.ndarray:
    """Pure-numpy single-clip MFCC (identical math to the device paths).

    Host env workers call this per episode; keeping it off the accelerator
    avoids a device round-trip (and a fresh trace per clip length) for a
    sub-millisecond computation.
    """
    n_fft, _, hop, _ = params
    w_cos, w_sin, mel, dct, _, off = _frontend_constants(params, "float32")
    L = wav.shape[0]
    T = int(num_frames(L, hop))
    padded = np.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
    x = padded[off:]
    win = w_cos.shape[0]
    idx = (np.arange(T) * hop)[:, None] + np.arange(win)[None, :]
    frames = x[idx]  # (T, win)
    re = frames @ w_cos
    im = frames @ w_sin
    power = re * re + im * im
    return np.log(power @ mel + LOG_EPS) @ dct


def mfcc_single(wav: np.ndarray, params: STFTParams,
                backend: str = "numpy") -> np.ndarray:
    """Convenience single-clip MFCC -> (frames, 40) numpy (host callers).

    Matches audioLoader.get_mfcc output orientation
    (reference: Envs/audioLoader.py:157-158).
    """
    wav = np.asarray(wav)
    if wav.dtype == np.int16:
        wav = (wav / 32768.0).astype(np.float32)
    wav = wav.astype(np.float32)
    if backend == "numpy":
        return _mfcc_numpy(wav, params)
    out = mfcc_batch(jnp.asarray(wav[None, :]), params, backend=backend)
    return np.asarray(out[0])


def process_sound_feat(feat: np.ndarray, target_frames: int) -> np.ndarray:
    """Host-side pad-or-truncate to (1, target_frames, 40)
    (reference: Envs/audioLoader.py:241-252)."""
    feat = np.expand_dims(np.asarray(feat), axis=0)
    nf = feat.shape[1]
    if target_frames < nf:
        feat = feat[:, :target_frames, :]
    else:
        pad = np.zeros((1, target_frames - nf, feat.shape[2]), dtype=feat.dtype)
        feat = np.concatenate([feat, pad], axis=1)
    return feat


# -- python_speech_features-semantics backend (host) -------------------------
#
# The reference's get_mfcc has a second branch calling
# python_speech_features.mfcc(audioSamples, fs, winlen, winstep, numcep=40,
# nfilt=40, nfft, winfunc=np.hamming) (Envs/audioLoader.py:159-162). Its
# conventions differ from the torchaudio path in every stage; this is a
# faithful numpy twin of that library's defaults so the `mfcc_from` knob
# keeps working without the dependency.


def psf_filterbank(nfilt: int, n_fft: int, sample_rate: int,
                   lowfreq: float = 0.0, highfreq=None) -> np.ndarray:
    """python_speech_features.get_filterbanks: triangular filters on
    FLOOR-quantized FFT bin indices (vs torchaudio's continuous-frequency
    triangles in mel_filterbank above). Returns (nfilt, n_fft//2+1)."""
    highfreq = highfreq or sample_rate / 2.0
    m_pts = np.linspace(hz_to_mel_htk(lowfreq), hz_to_mel_htk(highfreq),
                        nfilt + 2)
    bins = np.floor((n_fft + 1) * mel_to_hz_htk(m_pts) / sample_rate)
    fb = np.zeros((nfilt, n_fft // 2 + 1))
    for j in range(nfilt):
        for i in range(int(bins[j]), int(bins[j + 1])):
            fb[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(int(bins[j + 1]), int(bins[j + 2])):
            fb[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fb


def mfcc_psf(wav: np.ndarray, params: STFTParams, numcep: int = 40,
             nfilt: int = 40, preemph: float = 0.97, ceplifter: int = 22,
             append_energy: bool = True) -> np.ndarray:
    """MFCC with python_speech_features semantics -> (frames, numcep).

    Reproduces that library's default pipeline exactly: raw sample
    amplitudes (the reference feeds int16 without /32768 on this branch),
    0.97 pre-emphasis, non-centered framing with ceil frame count and a
    zero tail pad, |rfft|^2/NFFT power spectrum, floor-binned mel
    filterbank, eps floors on zero energies, ortho DCT-II over nfilt
    log-energies, sinusoidal liftering (L=22), and log total frame energy
    replacing coefficient 0.
    """
    n_fft, frame_len, frame_step, fs = params
    signal = np.asarray(wav, dtype=np.float64)
    signal = np.append(signal[0], signal[1:] - preemph * signal[:-1])
    slen = signal.shape[0]
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((1.0 * slen - frame_len) / frame_step))
    padlen = (numframes - 1) * frame_step + frame_len
    padded = np.concatenate([signal, np.zeros(padlen - slen)])
    idx = (np.arange(numframes)[:, None] * frame_step
           + np.arange(frame_len)[None, :])
    frames = padded[idx] * np.hamming(frame_len)[None, :]
    pspec = (np.abs(np.fft.rfft(frames, n_fft)) ** 2) / n_fft
    energy = pspec.sum(axis=1)
    energy = np.where(energy == 0, np.finfo(np.float64).eps, energy)
    feat = pspec @ psf_filterbank(nfilt, n_fft, fs).T
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    feat = np.log(feat) @ dct_matrix(numcep, nfilt)
    if ceplifter > 0:
        n = np.arange(numcep)
        feat = feat * (1.0 + (ceplifter / 2.0) * np.sin(np.pi * n / ceplifter))
    if append_energy:
        feat[:, 0] = np.log(energy)
    return feat.astype(np.float32)
