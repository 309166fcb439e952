"""bfloat16 compute path, goal-cache reuse, checkpoint resume."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from var_tpu.config import main_config
from var_tpu.models.encoders import VARPretextNet, init_pretext_params
from var_tpu.models.policy import act, build_policy


def test_bfloat16_encoders_finite_and_close():
    model32 = VARPretextNet(variant="arm", representation_dim=3,
                            dtype=jnp.float32)
    model16 = VARPretextNet(variant="arm", representation_dim=3,
                            dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(4, 3, 96, 96).astype(np.float32))
    snd = jnp.asarray(rng.randn(4, 1, 100, 40).astype(np.float32))
    p = model32.init(jax.random.PRNGKey(0), img, snd, snd)
    out32 = model32.apply(p, img, snd, snd)
    out16 = model16.apply(p, img, snd, snd)
    for k in ("image_feat", "sound_feat_positive"):
        a, b = np.asarray(out32[k]), np.asarray(out16[k])
        assert np.isfinite(b).all()
        # unit sphere outputs stay close under bf16 conv compute
        assert np.abs(a - b).max() < 0.1


def test_bfloat16_policy_act():
    cfg = main_config(env="arms")
    cfg.override(computeDtype="bfloat16", RLRecurrentSize=32,
                 RLRecurrentInputSize=16)
    from var_tpu.envs.spaces import Box

    policy = build_policy(cfg, Box(low=-np.ones(2), high=np.ones(2)))
    rng = np.random.RandomState(1)
    obs = {
        "image": jnp.asarray((rng.rand(2, 3, 96, 96) * 255).astype(np.uint8)),
        "image_feat": jnp.asarray(rng.randn(2, 3).astype(np.float32)),
        "robot_pose": jnp.asarray(rng.randn(2, 2).astype(np.float32)),
        "goal_sound_feat": jnp.asarray(rng.randn(2, 3).astype(np.float32)),
    }
    hx = jnp.zeros((2, 32))
    masks = jnp.ones((2, 1))
    v = policy.init(jax.random.PRNGKey(0), obs, hx, masks, 1)
    step = act(policy, v, obs, hx, masks, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(step.value)).all()
    assert np.isfinite(np.asarray(step.action)).all()


def test_goal_cache_reused_across_inf_steps(tmp_path):
    """Wrapper semantics: a fresh goal at step 0 populates the cache; inf
    sentinels afterwards must reuse it without calling the sound encoder."""
    from var_tpu.models.encoders import build_pretext_model
    from var_tpu.rl.reward import VecVARReward

    cfg = main_config(env="arms")
    model = build_pretext_model(cfg)
    params = init_pretext_params(model, cfg, jax.random.PRNGKey(0))["params"]
    w = VecVARReward.__new__(VecVARReward)
    w.config = cfg
    w.model = model
    w.params = params
    w.ret_norm = None
    w.num_envs = 2
    w.cached_goal_feat = np.zeros((2, 3), np.float32)
    w.processing_func = w._process_arm
    from var_tpu.utils.profiling import PhaseTimer

    w.timer = PhaseTimer()

    rng = np.random.RandomState(0)
    obs0 = {
        "image": (rng.rand(2, 3, 96, 96) * 255).astype(np.uint8),
        "goal_sound": rng.randn(2, 1, 100, 40).astype(np.float32),
        "robot_pose": rng.randn(2, 2).astype(np.float32),
    }
    _ = w._process_arm(obs0, np.zeros(2))
    cache_after_0 = w.cached_goal_feat.copy()
    assert np.any(cache_after_0 != 0)

    obs1 = dict(obs0)
    obs1["goal_sound"] = np.full((2, 1, 100, 40), np.inf, np.float32)
    obs1["image"] = (rng.rand(2, 3, 96, 96) * 255).astype(np.uint8)
    s1, _ = w._process_arm(obs1, np.zeros(2))
    np.testing.assert_array_equal(w.cached_goal_feat, cache_after_0)
    np.testing.assert_array_equal(s1["goal_sound_feat"], cache_after_0)


def test_checkpoint_resume_with_optimizer_state(tmp_path):
    """Full resume: params + opt_state round-trip through Orbax, and
    training continues from the restored state."""
    import optax

    from var_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from var_tpu.train.pretext import TrainState, make_optimizer

    cfg = main_config(env="arms")
    model = VARPretextNet(variant="arm", representation_dim=3)
    img = jnp.zeros((1, 3, 96, 96))
    snd = jnp.zeros((1, 1, 100, 40))
    params = model.init(jax.random.PRNGKey(0), img, snd, snd)["params"]
    tx = make_optimizer(cfg, steps_per_epoch=5)
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))

    # take one step so moments are non-trivial
    g = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.01, params)
    updates, opt_state = tx.update(g, state.opt_state, state.params)
    params2 = optax.apply_updates(state.params, updates)
    state = TrainState(params2, opt_state, state.step + 1)

    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, {"params": state.params,
                           "opt_state": state.opt_state,
                           "step": np.asarray(state.step)})
    # structured restore: pass a target so optax NamedTuple states come
    # back with their original structure, not as plain dicts
    target = {"params": params, "opt_state": tx.init(params),
              "step": np.asarray(0)}
    restored = load_checkpoint(path, target=target)
    assert int(np.asarray(restored["step"])) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored["opt_state"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # continuing a step from the restored state works
    updates2, _ = tx.update(g, restored["opt_state"], restored["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(updates2))


def test_goal_audio_playback(monkeypatch):
    """Render-mode goal-audio playback (reference: RL_env_VAR.py:507,513):
    silent no-op without sounddevice/an output device; hands the clip to
    the backend non-blocking when one exists."""
    import var_tpu.utils.audio_play as ap

    # headless container: no sounddevice package -> graceful False
    monkeypatch.setattr(ap, "_sd", None)
    assert ap.play_clip(np.zeros(100, np.int16)) is False
    assert ap._sd is False  # resolution cached

    calls = []

    class FakeSD:
        def play(self, clip, samplerate, blocking):
            calls.append((len(clip), samplerate, blocking))

    monkeypatch.setattr(ap, "_sd", FakeSD())
    assert ap.play_clip(np.zeros(160, np.int16)) is True
    assert calls == [(160, 16000, False)]
    assert ap.play_clip(None) is False  # no clip -> no call
    assert len(calls) == 1


def test_persistent_jit_cache_toggle(tmp_path, monkeypatch):
    """enable_persistent_cache points jax at a disk cache dir (created on
    demand), honors an explicit path and VAR_TPU_JIT_CACHE, and is a
    no-op returning '' when disabled with VAR_TPU_JIT_CACHE=0."""
    import jax

    from var_tpu.utils.jit_cache import enable_persistent_cache

    prev = jax.config.jax_compilation_cache_dir
    target = str(tmp_path / "jit")
    monkeypatch.delenv("VAR_TPU_JIT_CACHE", raising=False)
    assert enable_persistent_cache(target) == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target

    env_target = str(tmp_path / "jit_env")
    monkeypatch.setenv("VAR_TPU_JIT_CACHE", env_target)
    assert enable_persistent_cache() == env_target
    assert jax.config.jax_compilation_cache_dir == env_target

    monkeypatch.setenv("VAR_TPU_JIT_CACHE", "0")
    assert enable_persistent_cache(target) == ""
    # the tmp cache dirs vanish after the test: restore the prior setting
    jax.config.update("jax_compilation_cache_dir", prev)


def test_rss_watchdog_warns_once():
    from var_tpu.utils.profiling import RSSWatchdog, host_rss_gb

    assert host_rss_gb() > 0
    w = RSSWatchdog(frac=0.8)
    assert w.limit_gb > 0
    w.limit_gb = 1e-6  # force the threshold below current RSS
    import warnings as W

    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        r1 = w.check()
        r2 = w.check()
    assert r1 > 0 and r2 > 0
    msgs = [m for m in rec if "host RSS" in str(m.message)]
    assert len(msgs) == 1  # warned once, not per check


def test_success_curve_checkpoint_order(tmp_path):
    """scripts/success_curve.list_checkpoints must sort checkpoints by
    update NUMBER, not lexicographically ('999' < '01000' numerically but
    not as strings), and ignore non-checkpoint entries (CSVs, config
    snapshots)."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from success_curve import list_checkpoints

    for name in ["999", "01000", "00200", "0"]:
        (tmp_path / name).mkdir()
    (tmp_path / "config.json").write_text("{}")
    (tmp_path / "test_00200.csv").write_text("")
    got = [os.path.basename(p) for p in list_checkpoints(str(tmp_path))]
    assert got == ["0", "00200", "999", "01000"]


def test_success_curve_select_best():
    """select_best picks the highest success rate; ties break toward the
    LATER checkpoint (same measured rate, more training behind it)."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import pytest
    from success_curve import select_best

    rows = [
        {"checkpoint": "00100", "update": 100, "success_rate": 0.84},
        {"checkpoint": "00300", "update": 300, "success_rate": 0.78},
        {"checkpoint": "00200", "update": 200, "success_rate": 0.84},
    ]
    assert select_best(rows)["checkpoint"] == "00200"
    with pytest.raises(ValueError):
        select_best([])
