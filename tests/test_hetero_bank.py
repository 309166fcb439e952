"""Device path for heterogeneous STFT presets (the arm 'mix' preset:
GoogleCommand 512/160 + UrbanSound 1024/640 — reference:
Envs/pybullet/arms/tasks/fourInARow/config.py:123-131,
Envs/audioLoader.py:23-31): one packed clip bank per param set, one fused
MFCC per bank, rows merged by selector — no host per-clip fallback."""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from var_tpu.config import main_config
from var_tpu.data.audio_store import AudioStore, synth_clip
from var_tpu.ops.audio import mfcc_single, process_sound_feat, sound_features


@pytest.fixture
def mix_store():
    cfg = main_config(env="arms")
    audio = AudioStore(cfg)
    audio.loadData()  # synthetic fallback: words[i]['Synthetic']
    rng = np.random.RandomState(7)
    for i in range(cfg.taskNum):
        audio.words[i]["UrbanSound"] = [
            synth_clip(i, rng) for _ in range(3)]
    # declare the mixed preset (in-place: loadData already ran)
    cfg.soundSource["dataset"] = ["Synthetic", "UrbanSound"]
    assert not audio.params_homogeneous()
    return cfg, audio


def test_build_clip_banks_structure(mix_store):
    cfg, audio = mix_store
    banks, entries = audio.build_clip_banks()
    assert len(banks) == 2  # two distinct param sets
    p0, wav0, len0 = banks[0]
    p1, wav1, len1 = banks[1]
    assert (p0.n_fft, p0.hop_length) != (p1.n_fft, p1.hop_length)
    assert wav0.shape[1] == audio.buf_len_for(p0)
    assert wav1.shape[1] == audio.buf_len_for(p1)
    # every class appears in both banks (Synthetic + UrbanSound)
    for c in range(cfg.taskNum):
        assert sorted(k for k, _, _ in entries[c]) == [0, 1]
        for k, lo, hi in entries[c]:
            assert hi > lo and hi <= banks[k][1].shape[0]


def test_multi_bank_rows_match_host_mfcc(mix_store):
    """A bank row's fused device MFCC equals the per-clip host MFCC with
    that clip's own params (the reference behavior the bank replaces)."""
    cfg, audio = mix_store
    banks, entries = audio.build_clip_banks()
    for c, ds_name in ((0, "UrbanSound"), (1, "Synthetic")):
        clips = audio.words[c][ds_name]
        # find this dataset's entry: bank index by param identity
        p_target = audio.param_dict[ds_name]
        k, lo, hi = next(
            e for e in entries[c] if banks[e[0]][0] == p_target)
        p, wav, lens = banks[k]
        dev = np.asarray(sound_features(
            jnp.asarray(wav[lo : lo + 1]), jnp.asarray(lens[lo : lo + 1]),
            cfg.sound_dim[1], p, backend="fft"))
        host = process_sound_feat(
            mfcc_single(clips[0], p), cfg.sound_dim[1])
        np.testing.assert_allclose(dev[0], host, atol=2e-3, rtol=1e-3)


def test_sample_clip_ids_multi(mix_store):
    cfg, audio = mix_store
    banks, entries = audio.build_clip_banks()
    rng = np.random.RandomState(0)
    classes = np.array([0, 1, cfg.taskNum, 2])
    ids, sel, zero = audio.sample_clip_ids_multi(
        classes, entries, len(banks), rng)
    assert ids.shape == (4, 2) and sel.shape == (4, 2)
    assert zero.tolist() == [False, False, True, False]
    assert sel[2].sum() == 0  # empty intent selects nothing
    for i in (0, 1, 3):
        assert sel[i].sum() == 1  # exactly one bank per real row
        k = int(np.argmax(sel[i]))
        lo, hi = next((e[1], e[2]) for e in entries[classes[i]] if e[0] == k)
        assert lo <= ids[i, k] < hi


def test_trainer_uses_device_path_for_mix(mix_store, tmp_path):
    """trainRepresentation on a mixed preset goes through the multi-bank
    scanned epoch (not the host streaming fallback) and trains."""
    from var_tpu.data.triplets import save_shard
    from var_tpu.train.pretext import PretextTrainer

    cfg, audio = mix_store
    rng = np.random.RandomState(1)
    items = [{"image": (rng.rand(3, 96, 96) * 255).astype(np.uint8),
              "ground_truth": i % (cfg.taskNum + 1)} for i in range(12)]
    save_shard(str(tmp_path / "train" / "data_0.pickle"), items)
    cfg.override(
        pretextDataDir=[str(tmp_path)],
        pretextModelSaveDir=str(tmp_path / "model"),
        pretextModelLoadDir=str(tmp_path / "model" / "nope"),
        pretextTrainBatchSize=6,
        pretextModelFineTune=False,
    )
    trainer = PretextTrainer(cfg, audio=audio)
    losses = trainer.trainRepresentation(epoch=2, log_csv=False)
    assert len(losses) == 2 and all(np.isfinite(losses))
    # the device multi-bank path was actually taken (scanned epoch on TPU,
    # unrolled jitted step on CPU backends)
    assert trainer._multi_params is not None
    assert len(trainer._multi_params) == 2
    assert (trainer._multi_scan is not None
            or getattr(trainer, "_multi_step", None) is not None)
