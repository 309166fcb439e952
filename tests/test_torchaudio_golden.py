"""Direct golden test against torchaudio.transforms.MFCC.

The reference's default MFCC backend is torchaudio
(reference: Envs/audioLoader.py:149-158). torchaudio is not installed in
the build environment, so this module is skipped there; on any machine
with torchaudio it activates and pins our frontend to the real reference
operator (the in-tree parity tests pin against torch.stft + HTK mel +
scipy DCT reconstructions of the same math — tests/test_audio.py)."""
from __future__ import annotations

import numpy as np
import pytest

torchaudio = pytest.importorskip("torchaudio")
import torch  # noqa: E402

from var_tpu.ops.audio import PARAM_TABLE, mfcc_single, process_sound_feat  # noqa: E402


def _torch_mfcc(clip_i16: np.ndarray, param) -> np.ndarray:
    """Exactly the reference call (Envs/audioLoader.py:149-158)."""
    mfcc_func = torchaudio.transforms.MFCC(
        sample_rate=16000, n_mfcc=40, log_mels=True,
        melkwargs={
            "n_fft": param.n_fft,
            "win_length": param.win_length,
            "hop_length": param.hop_length,
            "n_mels": 40,
            "f_min": 0,
            "f_max": None,
            "window_fn": torch.hamming_window,
        },
    )
    x = torch.from_numpy((clip_i16 / 32768.0).astype(np.float32))
    return torch.transpose(mfcc_func(x), 0, 1).numpy()  # (frames, 40)


@pytest.mark.parametrize("dataset", ["GoogleCommand", "UrbanSound", "FSC"])
def test_mfcc_matches_torchaudio(dataset):
    param = PARAM_TABLE[dataset]
    rng = np.random.RandomState(0)
    clip = (rng.randn(14321) * 4000).astype(np.int16)
    ref = _torch_mfcc(clip, param)
    ours = mfcc_single(clip, param, backend="numpy")
    t = min(len(ref), len(ours))
    np.testing.assert_allclose(ours[:t], ref[:t], atol=1e-4, rtol=1e-4)


def test_processed_feature_matches_torchaudio():
    """Full (1, T, 40) feature path incl. pad/truncate
    (reference: Envs/audioLoader.py:241-252)."""
    param = PARAM_TABLE["GoogleCommand"]
    rng = np.random.RandomState(1)
    clip = (rng.randn(8000) * 2500).astype(np.int16)
    ref = process_sound_feat(_torch_mfcc(clip, param), 100)
    ours = process_sound_feat(mfcc_single(clip, param, backend="numpy"), 100)
    assert ours.shape == (1, 100, 40)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)
