"""Auxiliary vec wrappers, KV logger, episode recording, misc utils."""
import os

import numpy as np

from var_tpu.envs import spaces
from var_tpu.envs.fake import FakeArmEnv
from var_tpu.envs.vec.dummy import DummyVecEnv
from var_tpu.envs.vec.wrappers import (
    VecExtractDictObs,
    VecFrameStack,
    tile_images,
)
from var_tpu.utils.kvlogger import KVLogger
from var_tpu.utils.misc import rgetattr


def _venv(n=2):
    def fn():
        e = FakeArmEnv(max_steps=4)
        e.seed(0)
        return e

    return DummyVecEnv([fn] * n)


def test_extract_dict_obs():
    venv = VecExtractDictObs(_venv(), "robot_pose")
    obs = venv.reset()
    assert obs.shape == (2, 2)
    obs, r, d, i = venv.step(np.zeros((2, 2)))
    assert obs.shape == (2, 2)
    venv.close()


def test_frame_stack():
    inner = VecExtractDictObs(_venv(), "robot_pose")
    venv = VecFrameStack(inner, nstack=3)
    obs = venv.reset()
    assert obs.shape == (2, 6)
    assert np.all(obs[:, :4] == 0)  # only newest slot filled
    obs1, *_ = venv.step(np.zeros((2, 2)))
    assert np.array_equal(obs1[:, 2:4], obs[:, 4:6])  # shifted left
    venv.close()


def test_tile_images():
    imgs = np.arange(5 * 4 * 4 * 3).reshape(5, 4, 4, 3).astype(np.uint8)
    tiled = tile_images(imgs)
    assert tiled.shape[0] % 4 == 0 and tiled.shape[1] % 4 == 0
    np.testing.assert_array_equal(tiled[:4, :4], imgs[0])


def test_kvlogger(tmp_path):
    lg = KVLogger(log_dir=str(tmp_path), formats=["json", "csv"])
    lg.logkv("a", 1.0)
    lg.logkv_mean("b", 2.0)
    lg.logkv_mean("b", 4.0)
    with lg.profile_kv("phase"):
        pass
    out = lg.dumpkvs()
    assert out["a"] == 1.0 and out["b"] == 3.0 and "wait_phase" in out
    assert os.path.exists(os.path.join(str(tmp_path), "progress.jsonl"))
    assert os.path.exists(os.path.join(str(tmp_path), "progress_kv.csv"))


def test_episode_recording(tmp_path):
    from var_tpu.envs.recording import save_episode_image

    class C:
        episodeImgSaveInterval = 2
        episodeImgSaveDir = os.path.join(str(tmp_path), "imgs")
        episodeImgSize = (48, 48, 3)

    img = (np.random.rand(96, 96, 3) * 255).astype(np.uint8)
    assert save_episode_image(C, img, episode=1, step=0) is None  # off-interval
    path = save_episode_image(C, img, episode=2, step=3)
    assert path and os.path.exists(path)


def test_rgetattr():
    class A:
        class B:
            x = 7

        b = B()

    assert rgetattr(A(), "b.x") == 7


def test_nonrecurrent_ppo_update():
    import jax
    import jax.numpy as jnp

    from var_tpu.models.policy import build_policy
    from var_tpu.rl.ppo import PPO, PPOConfig

    class Cfg:
        RLPolicyBase = "arm_VAR"
        representationDim = 3
        robotStateDim = 2
        RLRecurrentPolicy = False
        RLRecurrentInputSize = 16
        RLRecurrentSize = 32
        RLActionHiddenSize = 32
        computeDtype = "float32"
        ppoClipParam = 0.2
        ppoEpoch = 2
        ppoNumMiniBatch = 2
        ppoValueLossCoef = 0.5
        ppoEntropyCoef = 0.01
        RLLr = 1e-4
        RLEps = 1e-5
        RLMaxGradNorm = 0.5

    cfg = Cfg()
    space = spaces.Box(low=-np.ones(2), high=np.ones(2))
    policy = build_policy(cfg, space)
    T, N = 4, 4
    rng = np.random.RandomState(0)
    obs0 = {
        "image": jnp.asarray((rng.rand(N, 3, 96, 96) * 255).astype(np.uint8)),
        "image_feat": jnp.zeros((N, 3)),
        "robot_pose": jnp.zeros((N, 2)),
        "goal_sound_feat": jnp.zeros((N, 3)),
    }
    hx = jnp.zeros((N, 1))
    variables = policy.init(jax.random.PRNGKey(0), obs0, hx,
                            jnp.ones((N, 1)), 1)
    ppo = PPO(policy, PPOConfig.from_config(cfg))
    state = ppo.init_state(variables["params"])
    batch = {
        "obs": {
            "image": jnp.asarray(
                (rng.rand(T, N, 3, 96, 96) * 255).astype(np.uint8)),
            "image_feat": jnp.asarray(rng.randn(T, N, 3).astype(np.float32)),
            "robot_pose": jnp.asarray(rng.randn(T, N, 2).astype(np.float32)),
            "goal_sound_feat": jnp.asarray(
                rng.randn(T, N, 3).astype(np.float32)),
        },
        "rnn_hx0": jnp.zeros((N, 1)),
        "actions": jnp.asarray(rng.randn(T, N, 2).astype(np.float32)),
        "value_preds": jnp.asarray(rng.randn(T, N).astype(np.float32)),
        "returns": jnp.asarray(rng.randn(T, N).astype(np.float32)),
        "masks": jnp.ones((T, N)),
        "old_log_probs": jnp.asarray(rng.randn(T, N).astype(np.float32)),
    }
    state, metrics = ppo.update(state, batch, jax.random.PRNGKey(1))
    import jax

    for v in metrics.values():
        assert bool(jnp.isfinite(v))


def test_kvlogger_csv_grows_columns_and_survives_restart(tmp_path):
    """New keys widen the CSV header (old rows padded) instead of being
    dropped, and a process restart adopts the existing header instead of
    appending a second one."""
    lg = KVLogger(log_dir=str(tmp_path), formats=["csv"])
    lg.logkv("a", 1)
    lg.dumpkvs()
    lg.logkv("a", 2)
    lg.logkv("b", 3)
    lg.dumpkvs()
    path = tmp_path / "progress_kv.csv"
    lines = path.read_text().splitlines()
    assert lines[0] == "a,b"
    assert lines[1].startswith("1") and lines[1].endswith(",")
    assert lines[2] == "2,3"
    # restart: header adopted, not duplicated
    lg2 = KVLogger(log_dir=str(tmp_path), formats=["csv"])
    lg2.logkv("a", 4)
    lg2.logkv("b", 5)
    lg2.dumpkvs()
    lines = path.read_text().splitlines()
    assert lines.count("a,b") == 1
    assert lines[-1] == "4,5"
