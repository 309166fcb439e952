"""Full two-stage pipeline driver tests: collect -> train VAR -> RL -> eval,
plus the self-improvement loop."""
import glob
import os

import numpy as np
import pytest

from var_tpu.config import gym_register, main_config


def _cfg(tmp_path, env="arms"):
    cfg = main_config(env=env)
    cfg.override(
        pretextDataDir=[os.path.join(str(tmp_path), "pretext_data")],
        pretextModelSaveDir=os.path.join(str(tmp_path), "var_model"),
        pretextModelLoadDir=os.path.join(str(tmp_path), "var_model", "0"),
        RLModelSaveDir=os.path.join(str(tmp_path), "rl_model"),
        RLModelLoadDir=os.path.join(str(tmp_path), "rl_model", "00000"),
        pretextCollectNum=[3, 3, 3, 3, 6],
        pretextDataEpisode=4,
        pretextDataNumFiles=2,
        pretextEnvMaxSteps=5,
        pretextNumEnvs=2,
        pretextEpoch=1,
        pretextModelSaveInterval=1,
        pretextTrainBatchSize=6,
        pretextModelFineTune=False,
        pretextDataset="VARDataset",
        RLTrain=True,
        RLModelFineTune=False,
        RLNumEnvs=2,
        RLEnvMaxSteps=3,
        ppoNumSteps=3,
        ppoNumMiniBatch=2,
        ppoEpoch=1,
        RLRecurrentSize=32,
        RLRecurrentInputSize=16,
        RLModelSaveInterval=1,
        vecEnvBackend="dummy",
    )
    cfg.skillInfos[0]["path"] = os.path.join(str(tmp_path), "rl_model", "00000")
    os.makedirs(cfg.pretextDataDir[0], exist_ok=True)
    return cfg


@pytest.mark.parametrize("env", ["arms", "ai2thor"])
def test_collect_pretext_data(tmp_path, env):
    from var_tpu.train.pretext import PretextTrainer

    cfg = _cfg(tmp_path, env=env)
    if env == "ai2thor":
        cfg.override(pretextCollectNum=[2, 2, 2, 2, 4])
    gym_register(cfg, env=env)
    trainer = PretextTrainer(cfg)
    trainer.collectPretextData()
    shards = glob.glob(os.path.join(cfg.pretextDataDir[0], "train", "*.pickle"))
    assert shards
    from var_tpu.data.triplets import load_shard

    pairs = [p for s in shards for p in load_shard(s)]
    assert pairs
    for p in pairs[:5]:
        assert p["image"].shape == (3, 96, 96)
        assert 0 <= int(np.asarray(p["ground_truth"]).reshape(())) <= cfg.taskNum


@pytest.mark.slow
def test_full_pipeline_arm(tmp_path):
    """collect -> train VAR -> train RL -> eval, end to end."""
    from var_tpu.train.pretext import PretextTrainer
    from var_tpu.train.rl import RLTrainer

    cfg = _cfg(tmp_path)
    gym_register(cfg, env="arms")

    # stage 1: collect + train the VAR
    pretext = PretextTrainer(cfg)
    pretext.collectPretextData()
    losses = pretext.trainRepresentation(epoch=1, log_csv=True)
    assert np.isfinite(losses).all()
    assert os.path.isdir(cfg.pretextModelLoadDir)

    # stage 2: RL with the frozen VAR
    rl = RLTrainer(cfg, env="arms")
    rl.load_pretext()
    rl.trainRL(total_steps=cfg.ppoNumSteps * cfg.RLNumEnvs * 2, log_interval=1)
    assert os.path.isdir(os.path.join(cfg.RLModelSaveDir, "00000"))

    # stage 3: eval the saved policy
    cfg.override(RLTrain=False)
    rl2 = RLTrainer(cfg, env="arms")
    rl2.load_pretext()
    rate = rl2.testRL(num_episodes=2)
    assert 0.0 <= rate <= 1.0
    # eval CSV exists (reference: VAR/RL_VAR.py:66-75)
    assert glob.glob(os.path.join(cfg.RLModelSaveDir, "test_*.csv"))


@pytest.mark.slow
def test_full_pipeline_ai2thor(tmp_path):
    """The second env family end to end (CRNN encoder, occupancy obs,
    inf-sentinel goal sounds)."""
    from var_tpu.train.pretext import PretextTrainer
    from var_tpu.train.rl import RLTrainer

    cfg = _cfg(tmp_path, env="ai2thor")
    cfg.override(pretextCollectNum=[2, 2, 2, 2, 4], pretextTrainBatchSize=4)
    gym_register(cfg, env="ai2thor")

    pretext = PretextTrainer(cfg)
    pretext.collectPretextData()
    losses = pretext.trainRepresentation(epoch=1, log_csv=False)
    assert np.isfinite(losses).all()

    rl = RLTrainer(cfg, env="ai2thor")
    rl.load_pretext()
    rl.trainRL(total_steps=cfg.ppoNumSteps * cfg.RLNumEnvs, log_interval=1)
    assert os.path.isdir(os.path.join(cfg.RLModelSaveDir, "00000"))


@pytest.mark.slow
def test_collection_with_stored_sounds(tmp_path):
    """pretextDataHasSound=True: shards carry raw sound features and
    training takes the precomputed-feature step."""
    from var_tpu.data.triplets import load_env_data, load_shard
    from var_tpu.train.pretext import PretextTrainer

    cfg = _cfg(tmp_path)
    cfg.override(pretextDataHasSound=True, pretextCollectNum=[2, 2, 2, 2, 4],
                 pretextDataEpisode=2)
    gym_register(cfg, env="arms")
    trainer = PretextTrainer(cfg)
    trainer.collectPretextData()
    shards = glob.glob(os.path.join(cfg.pretextDataDir[0], "train", "*.pickle"))
    pairs = [p for s in shards for p in load_shard(s)]
    assert any("sound_positive" in p for p in pairs)
    sample = next(p for p in pairs if "sound_positive" in p)
    assert np.asarray(sample["sound_positive"]).shape == cfg.sound_dim

    ds = load_env_data(cfg, trainer._ensure_audio())
    assert ds.has_sound
    losses = trainer.trainRepresentation(epoch=1, dataset=ds, log_csv=False)
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_manual_control_scripted(tmp_path):
    """Line-based manual control with a scripted command stream."""
    import jax

    from var_tpu.models.encoders import init_pretext_params
    from var_tpu.train.rl import RLTrainer

    # arm: continuous 'dx dy' commands
    cfg = _cfg(tmp_path)
    cfg.override(RLTrain=False, RLManualControl=True,
                 episodeImgSaveDir=os.path.join(str(tmp_path), "frames"))
    rl = RLTrainer(cfg, env="arms")
    rl.pretext_params = init_pretext_params(
        rl.pretext_model, cfg, jax.random.PRNGKey(0))["params"]
    script = iter(["0.5 0.5", "-1 0", "bogus", "0 1", "quit"])
    rl.manualControl(num_episodes=1, input_fn=lambda: next(script))
    assert os.path.exists(os.path.join(str(tmp_path), "frames",
                                       "manual_live.jpg"))

    # ai2thor: keyboard-mapping keys
    cfg2 = _cfg(tmp_path, env="ai2thor")
    cfg2.override(RLTrain=False, RLManualControl=True,
                  episodeImgSaveDir=os.path.join(str(tmp_path), "frames2"))
    rl2 = RLTrainer(cfg2, env="ai2thor")
    rl2.pretext_params = init_pretext_params(
        rl2.pretext_model, cfg2, jax.random.PRNGKey(0))["params"]
    script2 = iter(["w", "q", "T", "nope", "quit"])
    rl2.manualControl(num_episodes=1, input_fn=lambda: next(script2))


def test_manual_triplet_collection_scripted(tmp_path):
    """'r' buffers the current pair, 'z'/exit flushes a shard
    (reference 'r'/'z' keys)."""
    from var_tpu.data.triplets import load_shard
    from var_tpu.train.pretext import PretextTrainer

    cfg = _cfg(tmp_path)
    gym_register(cfg, env="arms")
    trainer = PretextTrainer(cfg)
    script = iter(["", "r", "", "r", "z", "", "r", "quit"])
    path = trainer.manuallyCollectPretextData(input_fn=lambda: next(script))
    shards = glob.glob(os.path.join(cfg.pretextDataDir[0], "train", "*.pickle"))
    assert len(shards) == 2  # the 'z' flush + the exit flush
    pairs = [p for s in shards for p in load_shard(s)]
    assert len(pairs) == 3
    assert all(p["image"].shape == (3, 96, 96) for p in pairs)


@pytest.mark.slow
def test_finetune_checkpoint_labels_continue(tmp_path):
    """A fine-tune run's checkpoint labels continue from the restored
    update counter, so latest_checkpoint() never resolves to a stale
    pre-fine-tune checkpoint when the fine-tune runs fewer updates than
    its base run (the self-improvement eval depends on this)."""
    import jax

    from var_tpu.models.encoders import init_pretext_params
    from var_tpu.train.checkpoint import latest_checkpoint
    from var_tpu.train.rl import RLTrainer

    cfg = _cfg(tmp_path)
    gym_register(cfg, env="arms")
    rl = RLTrainer(cfg, env="arms")
    rl.pretext_params = init_pretext_params(
        rl.pretext_model, cfg, jax.random.PRNGKey(0))["params"]
    # base run: 2 updates -> labels 00000, 00001
    rl.trainRL(total_steps=cfg.ppoNumSteps * cfg.RLNumEnvs * 2,
               log_interval=10)
    assert latest_checkpoint(cfg.RLModelSaveDir).endswith("00001")

    # fine-tune run with FEWER updates: must save 00002, not re-save 00000
    cfg.override(RLModelFineTune=True,
                 RLModelLoadDir=latest_checkpoint(cfg.RLModelSaveDir))
    rl2 = RLTrainer(cfg, env="arms")
    rl2.pretext_params = rl.pretext_params
    rl2.trainRL(total_steps=cfg.ppoNumSteps * cfg.RLNumEnvs,
                log_interval=10)
    assert os.path.isdir(os.path.join(cfg.RLModelSaveDir, "00002"))
    assert latest_checkpoint(cfg.RLModelSaveDir).endswith("00002")


def test_next_selfimprove_index(tmp_path):
    """Successive self_improve() invocations must not reuse shard names
    (an overwritten selfimprove_<i>.pickle silently stops the fine-tune
    dataset from accumulating across rounds)."""
    from var_tpu.train.self_improve import next_selfimprove_index

    cfg = _cfg(tmp_path)
    train_dir = os.path.join(cfg.pretextDataDir[0], "train")
    os.makedirs(train_dir, exist_ok=True)
    assert next_selfimprove_index(cfg) == 0
    for i in range(2):
        open(os.path.join(train_dir, f"selfimprove_{i}.pickle"), "w").close()
    assert next_selfimprove_index(cfg) == 2


@pytest.mark.slow
def test_self_improve_round(tmp_path):
    from var_tpu.train.pretext import PretextTrainer
    from var_tpu.train.self_improve import self_improve

    cfg = _cfg(tmp_path)
    gym_register(cfg, env="arms")
    # bootstrap a VAR checkpoint to fine-tune from
    pretext = PretextTrainer(cfg)
    pretext.collectPretextData()
    pretext.trainRepresentation(epoch=1, log_csv=False)

    self_improve(cfg, rounds=1, env="arms", pretext_epochs=1,
                 rl_steps=cfg.ppoNumSteps * cfg.RLNumEnvs)
    # fine-tuned artifacts exist
    assert os.path.isdir(os.path.join(cfg.pretextModelSaveDir, "0"))
    assert os.path.isdir(os.path.join(cfg.RLModelSaveDir, "00000"))


@pytest.mark.slow
def test_self_improve_round_scratch(tmp_path):
    """var_mode='scratch': the round retrains the VAR from random init
    with VARDataset semantics over the accumulated shards (VERDICT r3
    item 3) instead of fine-tuning the frozen association."""
    from var_tpu.train.pretext import PretextTrainer
    from var_tpu.train.self_improve import self_improve

    cfg = _cfg(tmp_path)
    gym_register(cfg, env="arms")
    pretext = PretextTrainer(cfg)
    pretext.collectPretextData()
    pretext.trainRepresentation(epoch=1, log_csv=False)

    self_improve(cfg, rounds=1, env="arms", pretext_epochs=1,
                 rl_steps=cfg.ppoNumSteps * cfg.RLNumEnvs,
                 var_mode="scratch")
    assert cfg.pretextDataset == "VARDataset"
    assert cfg.pretextModelFineTune is False
    assert os.path.isdir(os.path.join(cfg.pretextModelSaveDir, "0"))
    assert os.path.isdir(os.path.join(cfg.RLModelSaveDir, "00000"))


def test_self_improve_rejects_bad_mode(tmp_path):
    from var_tpu.train.self_improve import self_improve

    cfg = _cfg(tmp_path)
    with pytest.raises(ValueError, match="var_mode"):
        self_improve(cfg, rounds=1, env="arms", var_mode="nope")
