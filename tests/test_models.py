"""Model shape/behavior tests: VAR encoders, policy bases, distributions."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from var_tpu.envs.spaces import Box, Discrete
from var_tpu.models import distributions as D
from var_tpu.models.encoders import VARPretextNet
from var_tpu.models.policy import Policy, act, build_policy, evaluate_actions


class _Cfg:
    representationDim = 3
    computeDtype = "float32"


@pytest.mark.parametrize(
    "variant,sound_t", [("arm", 100), ("ai2thor", 600)]
)
def test_pretext_net_shapes_and_sphere(variant, sound_t):
    model = VARPretextNet(variant=variant, representation_dim=3)
    img = jnp.zeros((2, 3, 96, 96))
    snd = jnp.zeros((2, 1, sound_t, 40))
    params = model.init(jax.random.PRNGKey(0), img, snd, snd)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 3, 96, 96).astype(np.float32))
    snd_p = jnp.asarray(rng.randn(2, 1, sound_t, 40).astype(np.float32))
    snd_n = jnp.asarray(rng.randn(2, 1, sound_t, 40).astype(np.float32))
    out = model.apply(params, img, snd_p, snd_n)
    for k in ("image_feat", "sound_feat_positive", "sound_feat_negative"):
        assert out[k].shape == (2, 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out[k]), axis=1), 1.0, rtol=1e-5
        )
    # raw feature dims match the reference architectures
    if variant == "arm":
        assert out["image_feat_raw"].shape == (2, 64 * 3 * 3)
        assert out["pos_sound_raw"].shape == (2, 32 * 5)
    else:
        assert out["image_feat_raw"].shape == (2, 128 * 3 * 3)
        assert out["pos_sound_raw"].shape == (2, 1024)


def _arm_obs(B, rng):
    return {
        "image": jnp.asarray(rng.rand(B, 3, 96, 96).astype(np.float32)),
        "image_feat": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
        "robot_pose": jnp.asarray(rng.randn(B, 2).astype(np.float32)),
        "goal_sound_feat": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
    }


def _ai2thor_obs(B, rng):
    return {
        "image": jnp.asarray(rng.rand(B, 3, 96, 96).astype(np.float32)),
        "image_feat": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
        "occupancy": jnp.asarray(rng.rand(B, 1, 9, 9).astype(np.float32)),
        "goal_sound_feat": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
    }


class _ArmCfg:
    RLPolicyBase = "arm_VAR"
    representationDim = 3
    robotStateDim = 2
    RLRecurrentPolicy = True
    RLRecurrentInputSize = 128
    RLRecurrentSize = 512
    RLActionHiddenSize = 128
    computeDtype = "float32"


class _ThorCfg(_ArmCfg):
    RLPolicyBase = "ai2thor_VAR"
    RLRecurrentSize = 1024


def test_arm_policy_act_and_evaluate():
    rng = np.random.RandomState(1)
    cfg = _ArmCfg()
    space = Box(low=-1, high=1, shape=(2,))
    model = build_policy(cfg, space)
    B = 4
    obs = _arm_obs(B, rng)
    hx = jnp.zeros((B, 512))
    masks = jnp.ones((B, 1))
    variables = model.init(jax.random.PRNGKey(0), obs, hx, masks, 1)

    step = act(model, variables, obs, hx, masks, jax.random.PRNGKey(1))
    assert step.value.shape == (B, 1)
    assert step.action.shape == (B, 2)
    assert step.action_log_prob.shape == (B, 1)
    assert step.rnn_hx.shape == (B, 512)

    # sequence evaluation: T=3 chunks, N=4 envs
    T = 3
    obs_seq = _arm_obs(T * B, rng)
    masks_seq = jnp.ones((T * B, 1))
    actions = jnp.asarray(rng.randn(T * B, 2).astype(np.float32))
    values, lp, ent = evaluate_actions(
        model, variables, obs_seq, hx, masks_seq, actions, T
    )
    assert values.shape == (T * B, 1)
    assert lp.shape == (T * B, 1)
    assert ent.shape == ()


def test_ai2thor_policy_discrete():
    rng = np.random.RandomState(2)
    cfg = _ThorCfg()
    space = Discrete(8)
    model = build_policy(cfg, space)
    B = 2
    obs = _ai2thor_obs(B, rng)
    hx = jnp.zeros((B, 1024))
    masks = jnp.ones((B, 1))
    variables = model.init(jax.random.PRNGKey(0), obs, hx, masks, 1)
    step = act(model, variables, obs, hx, masks, jax.random.PRNGKey(3))
    assert step.action.shape == (B, 1)
    assert step.action.dtype == jnp.int32
    assert 0 <= int(step.action[0, 0]) < 8
    det = act(model, variables, obs, hx, masks, jax.random.PRNGKey(4),
              deterministic=True)
    det2 = act(model, variables, obs, hx, masks, jax.random.PRNGKey(5),
               deterministic=True)
    np.testing.assert_array_equal(np.asarray(det.action), np.asarray(det2.action))


def test_sequence_step_consistency():
    """Evaluating a T-step sequence must equal stepping one-by-one."""
    rng = np.random.RandomState(3)
    cfg = _ArmCfg()
    space = Box(low=-1, high=1, shape=(2,))
    model = build_policy(cfg, space)
    N, T = 2, 4
    hx0 = jnp.asarray(rng.randn(N, 512).astype(np.float32))
    obs_t = [_arm_obs(N, rng) for _ in range(T)]
    masks_t = (rng.rand(T, N, 1) > 0.3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), obs_t[0], hx0,
                           jnp.ones((N, 1)), 1)

    # step-by-step values
    hx = hx0
    vals = []
    for t in range(T):
        v, dist, hx = model.apply(variables, obs_t[t], hx, jnp.asarray(masks_t[t]), 1)
        vals.append(np.asarray(v))
    golden = np.stack(vals)  # (T, N, 1)

    # sequence in one call: flatten (T, N) -> (T*N)
    obs_flat = {
        k: jnp.concatenate([o[k] for o in obs_t], axis=0) for k in obs_t[0]
    }
    masks_flat = jnp.asarray(masks_t.reshape(T * N, 1))
    v_seq, _, _ = model.apply(variables, obs_flat, hx0, masks_flat, T)
    np.testing.assert_allclose(
        np.asarray(v_seq).reshape(T, N, 1), golden, rtol=2e-4, atol=2e-4
    )


def test_categorical_log_probs_match_torch():
    rng = np.random.RandomState(4)
    logits = rng.randn(6, 5).astype(np.float32)
    actions = rng.randint(0, 5, size=(6, 1))
    dist = D.DistParams(kind="categorical", logits=jnp.asarray(logits))
    golden = (
        torch.distributions.Categorical(logits=torch.from_numpy(logits))
        .log_prob(torch.from_numpy(actions[:, 0]))
        .numpy()[:, None]
    )
    np.testing.assert_allclose(
        np.asarray(D.log_probs(dist, jnp.asarray(actions))), golden,
        rtol=1e-5, atol=1e-5,
    )
    g_ent = torch.distributions.Categorical(
        logits=torch.from_numpy(logits)).entropy().numpy()
    np.testing.assert_allclose(np.asarray(D.entropy(dist)), g_ent,
                               rtol=1e-5, atol=1e-5)


def test_gaussian_log_probs_match_torch():
    rng = np.random.RandomState(5)
    mean = rng.randn(6, 2).astype(np.float32)
    logstd = rng.randn(2).astype(np.float32) * 0.3
    actions = rng.randn(6, 2).astype(np.float32)
    dist = D.DistParams(kind="gaussian", mean=jnp.asarray(mean),
                        logstd=jnp.asarray(logstd))
    tn = torch.distributions.Normal(
        torch.from_numpy(mean), torch.from_numpy(np.exp(logstd))
    )
    golden = tn.log_prob(torch.from_numpy(actions)).sum(-1, keepdim=True).numpy()
    np.testing.assert_allclose(
        np.asarray(D.log_probs(dist, jnp.asarray(actions))), golden,
        rtol=1e-4, atol=1e-5,
    )
    g_ent = tn.entropy().sum(-1).numpy()
    np.testing.assert_allclose(np.asarray(D.entropy(dist)), g_ent,
                               rtol=1e-5, atol=1e-5)
