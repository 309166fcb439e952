"""End-to-end pretext training smoke tests on synthetic data."""
import os

import numpy as np
import pytest

from var_tpu.config import main_config
from var_tpu.data.audio_store import AudioStore
from var_tpu.data.triplets import (
    TripletDataset,
    TripletFineTuneDataset,
    save_shard,
)
from var_tpu.train.pretext import PretextTrainer


def _make_shard(tmp_path, config, n=24, seed=0):
    rng = np.random.RandomState(seed)
    pairs = []
    for _ in range(n):
        gt = rng.randint(0, config.taskNum + 1)
        sn = rng.randint(0, config.taskNum)
        if sn == gt:
            sn = config.taskNum
        pairs.append(
            {
                # class-dependent image so the loss can actually decrease
                "image": (rng.rand(3, 96, 96) * 50 + gt * 40).astype(np.uint8),
                "ground_truth": np.int32(gt),
                "sound_negative_id": np.int32(sn),
            }
        )
    path = os.path.join(str(tmp_path), "train", "data_0.pickle")
    save_shard(path, pairs)
    return path


@pytest.fixture(scope="module")
def arm_config(tmp_path_factory):
    cfg = main_config(env="arms")
    tmp = tmp_path_factory.mktemp("pretext_arm")
    cfg.override(
        pretextDataDir=[str(tmp)],
        pretextModelSaveDir=os.path.join(str(tmp), "model"),
        pretextModelFineTune=False,
        pretextDataset="VARDataset",
        pretextTrainBatchSize=8,
        pretextEpoch=2,
        pretextModelSaveInterval=2,
    )
    _make_shard(tmp, cfg)
    return cfg


def test_dataset_semantics(arm_config):
    audio = AudioStore(arm_config)
    audio.loadData()
    paths = [os.path.join(arm_config.pretextDataDir[0], "train", "data_0.pickle")]

    ds = TripletDataset(paths, arm_config, audio, seed=0)
    assert len(ds) == 24
    b0 = next(ds.iter_epoch(8, epoch=0, shuffle=False))
    b1 = next(ds.iter_epoch(8, epoch=1, shuffle=False))
    # VARDataset resamples sounds across epochs
    assert not np.allclose(b0.pos_wav, b1.pos_wav)
    # empty-intent rows flagged for zero features
    assert np.array_equal(b0.pos_zero, b0.ground_truth >= arm_config.taskNum)

    fds = TripletFineTuneDataset(paths, arm_config, audio, seed=0)
    f0 = next(fds.iter_epoch(8, epoch=0, shuffle=False))
    f1 = next(fds.iter_epoch(8, epoch=5, shuffle=False))
    # fine-tune dataset freezes the image<->sound association
    np.testing.assert_array_equal(f0.pos_wav, f1.pos_wav)


def test_pretext_training_loss_decreases(arm_config):
    trainer = PretextTrainer(arm_config)
    losses = trainer.trainRepresentation(epoch=2, log_csv=True)
    assert len(losses) == 2
    assert np.isfinite(losses).all()
    # checkpoint written
    assert os.path.isdir(os.path.join(arm_config.pretextModelSaveDir, "1"))
    assert os.path.exists(os.path.join(arm_config.pretextModelSaveDir, "progress.csv"))

    # reload round-trips
    trainer2 = PretextTrainer(arm_config)
    trainer2.loadPretextModel(os.path.join(arm_config.pretextModelSaveDir, "1"))
    import jax.numpy as jnp
    import jax

    a = jax.tree_util.tree_leaves(trainer.variables["params"])
    b = jax.tree_util.tree_leaves(trainer2.variables["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_training_actually_learns(arm_config):
    """More epochs on separable data must drive the triplet loss well below
    the margin-1.0 starting point."""
    trainer = PretextTrainer(arm_config)
    losses = trainer.trainRepresentation(epoch=16, log_csv=False)
    # margin-1.0 triplet loss starts around 1.0; separable data must pull
    # the tail average clearly below the start
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) - 0.1
    assert min(losses) < 0.9


def test_multistep_lr_resume_and_fold():
    """MultiStepLR parity: milestones fire at the correct GLOBAL epoch,
    including when resuming mid-schedule (torch tracks last_epoch
    absolutely — reference: utils.py get_scheduler)."""
    from var_tpu.train.pretext import multistep_lr

    spe = 10  # steps per epoch
    sched = multistep_lr(1.0, [2, 4], 0.1, spe)
    assert float(sched(0)) == 1.0
    assert float(sched(2 * spe - 1)) == 1.0
    assert abs(float(sched(2 * spe)) - 0.1) < 1e-6
    assert abs(float(sched(4 * spe)) - 0.01) < 1e-6
    # resume at epoch 3: milestone 2 already folded, milestone 4 shifts
    resumed = multistep_lr(1.0, [2, 4], 0.1, spe, start_step=3 * spe)
    assert abs(float(resumed(0)) - 0.1) < 1e-6
    assert abs(float(resumed(spe - 1)) - 0.1) < 1e-6
    assert abs(float(resumed(spe)) - 0.01) < 1e-6  # global epoch 4


def test_pretext_lr_step_none_is_constant():
    """pretextLRStep != 'step' -> constant LR, no MultiStepLR decay
    (reference: utils.py:42-47 returns no scheduler unless 'step')."""
    import jax.numpy as jnp
    import optax

    from var_tpu.config import main_config
    from var_tpu.train.pretext import make_optimizer

    cfg = main_config(env="arms")
    cfg.override(pretextLRStep="none", pretextLR=1e-3,
                 pretextLRDecayEpoch=[1, 2], pretextLRDecayGamma=0.1,
                 pretextAdamL2=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=2)
    params = {"w": jnp.ones(())}
    state = tx.init(params)
    g = {"w": jnp.ones(())}
    # step far past every milestone: Adam's unit-scale update times a
    # constant LR stays 1e-3; a decayed schedule would shrink it 100x
    for _ in range(6):
        updates, state = tx.update(g, state, params)
    assert abs(float(updates["w"]) + 1e-3) < 2e-4

    cfg.override(pretextLRStep="step")
    tx2 = make_optimizer(cfg, steps_per_epoch=2)
    state2 = tx2.init(params)
    for _ in range(6):
        updates2, state2 = tx2.update(g, state2, params)
    assert abs(float(updates2["w"])) < 1e-4  # decayed to 1e-5 by epoch 2
    del optax


def test_mfcc_batch_accepts_int16():
    """Bank rows are int16; mfcc_batch must normalize them, not cast the
    frontend constants to the integer dtype (which silences the window)."""
    import jax.numpy as jnp

    from var_tpu.ops.audio import PARAM_TABLE, mfcc_batch

    rng = np.random.RandomState(0)
    p = PARAM_TABLE["GoogleCommand"]
    wav_f = rng.randn(2, 4000).astype(np.float32) * 0.2
    wav_i = (wav_f * 32768.0).astype(np.int16)
    out_f = np.asarray(mfcc_batch(jnp.asarray(wav_f), p, backend="fft"))
    out_i = np.asarray(mfcc_batch(jnp.asarray(wav_i), p, backend="fft"))
    assert np.isfinite(out_i).all()
    np.testing.assert_allclose(out_i, out_f, atol=2e-2, rtol=1e-2)


def test_prefetch_epoch_order_and_pairing():
    """The streaming-path double-buffered prefetch must yield every batch
    exactly once, in iterator order, each paired with its own transfer
    (train/pretext.py::_prefetch_epoch)."""
    from var_tpu.config import main_config
    from var_tpu.train.pretext import PretextTrainer

    tr = PretextTrainer(main_config(env="arms"))

    class DS:
        def iter_epoch(self, batch_size, epoch, shuffle, drop_last):
            assert batch_size == 4 and epoch == 2
            for i in range(5):
                yield ("batch", i)

    tr._device_batch = lambda b: ("dev", b[1])
    out = list(tr._prefetch_epoch(DS(), 4, 2))
    assert out == [(("batch", i), ("dev", i)) for i in range(5)]
    # empty epoch terminates cleanly
    class Empty:
        def iter_epoch(self, *a, **k):
            return iter(())
    assert list(tr._prefetch_epoch(Empty(), 4, 2)) == []
