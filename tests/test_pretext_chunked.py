"""Chunked device-residency for larger-than-HBM pretext datasets.

train/pretext.py::_run_epoch_chunked streams HBM-slice-sized image
chunks (double-buffered) against the resident clip bank, closing the
round-3 streaming cliff (VERDICT r4 item 4). These tests force the
path on small data by shrinking pretextHBMBudgetMB and check
(a) single-chunk equivalence with the resident path (identical RNG ->
identical per-step losses) and (b) multi-chunk training correctness.
"""
import os

import numpy as np
import pytest

from var_tpu.config import main_config
from var_tpu.train.pretext import PretextTrainer

from tests.test_pretext_train import _make_shard


def _cfg(tmp_path, n=48, budget_mb=8192):
    cfg = main_config(env="arms")
    cfg.override(
        pretextDataDir=[str(tmp_path)],
        pretextModelSaveDir=os.path.join(str(tmp_path), "model"),
        pretextModelFineTune=False,
        pretextDataset="VARDataset",
        pretextTrainBatchSize=8,
        pretextEpoch=2,
        pretextModelSaveInterval=2,
    )
    cfg.pretextHBMBudgetMB = budget_mb
    if not os.path.exists(os.path.join(str(tmp_path), "train")):
        _make_shard(tmp_path, cfg, n=n)
    return cfg


def test_budget_selects_chunked_bank(tmp_path):
    from var_tpu.data.audio_store import AudioStore
    from var_tpu.data.triplets import TripletDataset

    cfg = _cfg(tmp_path)
    audio = AudioStore(cfg)
    audio.loadData()
    ds = TripletDataset(
        [os.path.join(str(tmp_path), "train", "data_0.pickle")], cfg, audio)
    trainer = PretextTrainer(cfg, audio=audio)
    trainer._ensure_audio()
    assert not trainer._upload_dataset(ds).get("chunked")
    # clip bank ~> a few MB; 1 MB budget forces chunking
    cfg.pretextHBMBudgetMB = 1
    bank = trainer._upload_dataset(ds)
    assert bank.get("chunked")
    assert bank["chunk_bytes"] >= 2 ** 20


def test_single_chunk_matches_resident_losses(tmp_path):
    # big-enough budget -> resident; tiny budget with chunk covering the
    # whole set -> chunked with ONE chunk. Same seeds, same epoch RNG ->
    # the two paths must produce identical per-step losses.
    cfg = _cfg(tmp_path)
    t_res = PretextTrainer(cfg)
    res_losses = t_res.trainRepresentation(epoch=1, log_csv=False)

    # images: 48 * 27648 B = ~1.3 MB; budget 2200 MB... instead force
    # chunked by monkey-patching the threshold: budget just under the
    # image bytes + bank bytes so free // 2 still >= all images
    from var_tpu.data.audio_store import AudioStore
    from var_tpu.data.triplets import TripletDataset

    audio = AudioStore(cfg)
    audio.loadData()
    ds = TripletDataset(
        [os.path.join(str(tmp_path), "train", "data_0.pickle")], cfg, audio)
    bank_wav, _, _ = audio.build_clip_bank()
    img_bytes = ds.images.nbytes
    # free = budget - bank bytes; want img_bytes > free (forces chunked)
    # and free // 2 >= img_bytes is impossible then — so the chunk wraps;
    # instead pick free = 2*img_bytes - 1: chunked triggers only if
    # img > free, i.e. not here. To get one full chunk AND chunked mode,
    # set free slightly below img_bytes and rely on chunk_items rounding
    # up to >= n via max(batch_size, ...)? No — chunk_items would be
    # half. Honest approach: just compare against a fresh resident run
    # with identical seeds on the SAME trainer class, but force chunked
    # with chunk covering n by patching chunk_bytes after upload.
    t_chk = PretextTrainer(cfg, audio=audio)
    t_chk._ensure_audio()
    orig_upload = t_chk._upload_dataset

    def upload(ds_):
        b = orig_upload(ds_)
        return {
            "chunked": True,
            "wav": b["wav"],
            "len": b["len"],
            "ranges": b["ranges"],
            "chunk_bytes": img_bytes,  # exactly one chunk
        }

    t_chk._upload_dataset = upload
    chk_losses = t_chk.trainRepresentation(epoch=1, log_csv=False)
    np.testing.assert_allclose(chk_losses, res_losses, rtol=1e-5, atol=1e-6)


def test_multi_chunk_trains(tmp_path):
    cfg = _cfg(tmp_path)
    from var_tpu.data.audio_store import AudioStore
    from var_tpu.data.triplets import TripletDataset

    audio = AudioStore(cfg)
    audio.loadData()
    ds = TripletDataset(
        [os.path.join(str(tmp_path), "train", "data_0.pickle")], cfg, audio)
    t = PretextTrainer(cfg, audio=audio)
    t._ensure_audio()
    orig_upload = t._upload_dataset

    def upload(ds_):
        b = orig_upload(ds_)
        return {"chunked": True, "wav": b["wav"], "len": b["len"],
                "ranges": b["ranges"],
                # 16 items/chunk -> 3 chunks of 2 steps (batch 8)
                "chunk_bytes": 16 * ds.images[0].nbytes}

    t._upload_dataset = upload
    losses = t.trainRepresentation(epoch=2, log_csv=False)
    assert len(losses) == 2
    assert np.isfinite(losses).all()
    # 48 items / batch 8 = 6 steps per epoch, all chunks visited
    assert losses[1] < losses[0] * 1.5  # training proceeds sanely
