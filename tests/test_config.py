"""Config system and registry behavior tests."""
import numpy as np
import pytest

from var_tpu.config import AI2ThorConfig, ArmConfig, gym_register, main_config
from var_tpu.envs.core import make, registered_ids
from var_tpu.envs import spaces


def test_main_config_profiles():
    arm = main_config(env="arms")
    assert arm.name == "ArmConfig"
    assert arm.taskNum == 4
    assert arm.sound_dim == (1, 100, 40)
    assert arm.img_dim == (3, 96, 96)
    assert arm.RLActionDim == (2,)

    thor = main_config(env="ai2thor")
    assert thor.name == "AI2ThorConfig"
    assert thor.taskNum == 4  # livingRoom x {FloorLamp, Television} x 2 acts
    assert thor.sound_dim == (1, 600, 40)
    assert len(thor.allActions) == 8

    with pytest.raises(NotImplementedError):
        main_config(env="bogus")
    with pytest.raises(NotImplementedError):
        main_config(env="arms", task="unknownTask")


def test_cfg_check_rejects_conflicting_flags():
    cfg = main_config(env="ai2thor")
    cfg.override(RLTrain=True, RLManualControl=True)
    with pytest.raises(ValueError):
        cfg.cfg_check()


def test_override_unknown_knob():
    cfg = main_config(env="arms")
    with pytest.raises(AttributeError):
        cfg.override(nonexistentKnob=1)


def test_reassignment_warning(capsys):
    cfg = main_config(env="arms")
    cfg.RLLr = 1e-3  # direct reassignment warns
    out = capsys.readouterr().out
    assert "Reassignment of RLLr" in out


def test_config_json_snapshot(tmp_path):
    import json
    import os

    cfg = main_config(env="arms")
    path = os.path.join(str(tmp_path), "config.json")
    cfg.save_json(path)
    with open(path) as f:
        snap = json.load(f)
    assert snap["pretextLR"] == 1e-4
    assert snap["taskNum"] == 4


def test_registry_registration_and_errors():
    cfg = main_config(env="arms")
    gym_register(cfg, env="arms")
    assert "arms-RL-v2" in registered_ids()
    assert "arms-pretext-v2" in registered_ids()
    env = make("arms-RL-v2")
    assert env.action_space.shape == (2,)
    env.close()
    with pytest.raises(KeyError):
        make("never-registered-v99")


def test_spaces_sample_and_contains():
    rng = np.random.RandomState(0)
    box = spaces.Box(low=-1, high=1, shape=(3,))
    x = box.sample(rng)
    assert box.contains(x)
    assert not box.contains(np.ones(4))
    assert not box.contains(np.ones(3) * 5)

    disc = spaces.Discrete(4)
    assert disc.contains(disc.sample(rng))
    assert not disc.contains(7)

    d = spaces.DictSpace({"a": box, "b": disc})
    s = d.sample(rng)
    assert d.contains(s)
    z = spaces.zeros_like_space(d, batch=5)
    assert z["a"].shape == (5, 3)


def test_cli_build_config():
    from var_tpu.cli import build_config, parse_args

    args = parse_args(["--env", "arms", "--set", "pretextEpoch=7",
                       "RLTrain=True", 'pretextModel="arm_VARPretextNet"'])
    cfg = build_config(args, role="pretext")
    assert cfg.pretextEpoch == 7
    assert cfg.RLTrain is True
    assert cfg.pretext_RL == "pretext"
    with pytest.raises(SystemExit):
        build_config(parse_args(["--set", "noSuchKnob=3"]), role="RL")


def test_cli_boolean_fallbacks_and_recheck():
    """--set RLTrain=false must become False (not a truthy string), and
    the post-override cfg_check rejects invalid flag combinations."""
    import pytest

    from var_tpu.cli import build_config, parse_args

    cfg = build_config(parse_args(
        ["--env", "arms", "--set", "RLTrain=false", "fusedRollout=FALSE",
         "RLModelFineTune=true"]), role="RL")
    assert cfg.RLTrain is False
    assert cfg.fusedRollout is False
    assert cfg.RLModelFineTune is True
    with pytest.raises(ValueError):
        build_config(parse_args(
            ["--env", "arms", "--set", "RLTrain=True",
             "RLManualControl=True"]), role="RL")


def test_override_recomputes_derived_knobs():
    """Derived knobs resync after override unless explicitly set."""
    from var_tpu.config import main_config

    cfg = main_config(env="arms")
    cfg.override(pretextModelFineTune=False)
    assert cfg.pretextDataset == "VARDataset"
    cfg.override(RLEnvMaxSteps=7)
    assert cfg.ppoNumSteps == 7
    cfg.override(RLEnvMaxSteps=9, ppoNumSteps=3)  # explicit wins
    assert cfg.ppoNumSteps == 3
    cfg.override(soundSourcePreset="mix")
    assert cfg.soundSource["dataset"] == ["GoogleCommand", "UrbanSound"]
    assert not __import__("var_tpu.data.audio_store",
                          fromlist=["AudioStore"]).AudioStore(
        cfg).params_homogeneous()
