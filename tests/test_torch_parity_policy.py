"""Policy-network torch-twin parity (arm fusion base + value/action heads).

Completes the parity harness (tests/test_torch_parity.py covers the VAR
encoders): a PyTorch twin of armNet_VAR (reference:
models/RL/arm_RL_model.py:41-134) with weights ported from our flax
params must produce the same value and actor features, including through
the GRU core, within float32 tolerance.
"""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from var_tpu.envs.spaces import Box
from var_tpu.models.policy import build_policy


class _Cfg:
    RLPolicyBase = "arm_VAR"
    representationDim = 3
    robotStateDim = 2
    RLRecurrentPolicy = True
    RLRecurrentInputSize = 16
    RLRecurrentSize = 32
    RLActionHiddenSize = 32
    computeDtype = "float32"
    img_dim = (3, 96, 96)


class TorchArmPolicy(nn.Module):
    """The reference arm policy stack at the test's reduced widths."""

    def __init__(self, rep=3, rin=16, rsize=32, ahid=32):
        super().__init__()
        self.imgCNN = nn.Sequential(
            nn.Conv2d(3, 32, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(32, 32, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(32, 64, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(64, 64, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(64, 128, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(128, 128, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(128, 256, 3, 2, 0), nn.ReLU(),
            nn.Conv2d(256, 128, 3, 1, 0), nn.ReLU(), nn.Flatten())
        self.cnnMlp = nn.Sequential(nn.Linear(1152, 512), nn.ReLU(),
                                    nn.Linear(512, 256), nn.ReLU())
        self.motorMlp = nn.Sequential(nn.Linear(rep + 2, 256), nn.ReLU(),
                                      nn.Linear(256, 512), nn.ReLU(),
                                      nn.Linear(512, 256), nn.ReLU())
        self.imgMotorMlp = nn.Sequential(nn.Linear(256, 256), nn.ReLU(),
                                         nn.Linear(256, rin), nn.ReLU())
        self.gru = nn.GRU(rin, rsize)
        self.imgMotorMlp2 = nn.Sequential(nn.Linear(rsize, 256), nn.ReLU())
        self.soundMlp = nn.Sequential(nn.Linear(rep, 128), nn.ReLU(),
                                      nn.Linear(128, 256), nn.ReLU(),
                                      nn.Linear(256, 256), nn.ReLU())
        self.fusionMlp = nn.Sequential(nn.Linear(256, 512), nn.ReLU(),
                                       nn.Linear(512, 256), nn.ReLU())
        self.mlp_all = nn.Sequential(nn.Linear(256, 256), nn.ReLU(),
                                     nn.Linear(256, 128), nn.ReLU())
        self.actor = nn.Sequential(nn.Linear(128, 128), nn.ReLU(),
                                   nn.Linear(128, ahid), nn.ReLU())
        self.critic = nn.Sequential(nn.Linear(128, 128), nn.ReLU(),
                                    nn.Linear(128, 128), nn.ReLU())
        self.critic_linear = nn.Linear(128, 1)

    def forward(self, image, image_feat, robot_pose, sound_feat, hx, masks):
        img = self.cnnMlp(self.imgCNN(image))
        motor = self.motorMlp(torch.cat([image_feat, robot_pose], dim=1))
        im = self.imgMotorMlp(img + motor)
        out, hx = self.gru(im.unsqueeze(0), (hx * masks).unsqueeze(0))
        imr = self.imgMotorMlp2(out.squeeze(0))
        fusion = self.fusionMlp(self.soundMlp(sound_feat) + img)
        h = self.mlp_all(fusion + imr)
        return self.critic_linear(self.critic(h)), self.actor(h), hx.squeeze(0)


def _flatten_perm(h, w, c):
    idx = np.arange(h * w * c).reshape(h, w, c)
    return np.transpose(idx, (2, 0, 1)).reshape(-1)


def _port_dense(lin, p, perm=None):
    k = np.asarray(p["kernel"])
    if perm is not None:
        k = k[perm]
    lin.weight.data = torch.from_numpy(k.T.copy())
    lin.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def _port_conv(conv, p):
    conv.weight.data = torch.from_numpy(
        np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)).copy())
    conv.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def test_arm_policy_torch_twin():
    cfg = _Cfg()
    policy = build_policy(cfg, Box(low=-np.ones(2), high=np.ones(2)))
    rng = np.random.RandomState(0)
    B = 3
    obs = {
        "image": jnp.asarray((rng.rand(B, 3, 96, 96) * 255).astype(np.uint8)),
        "image_feat": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
        "robot_pose": jnp.asarray(rng.randn(B, 2).astype(np.float32)),
        "goal_sound_feat": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
    }
    hx = jnp.asarray(rng.randn(B, 32).astype(np.float32))
    masks = jnp.asarray((rng.rand(B, 1) > 0.5).astype(np.float32))
    variables = policy.init(jax.random.PRNGKey(0), obs, hx, masks, 1)
    value, dist, new_hx = policy.apply(variables, obs, hx, masks, 1)

    base = variables["params"]["base"]
    twin = TorchArmPolicy()
    conv_slots = [0, 2, 5, 7, 10, 12, 15, 17]
    for i, slot in enumerate(conv_slots):
        _port_conv(twin.imgCNN[slot], base[f"Conv_{i}"])
    # flatten permutation: last conv output is (3, 3, 128) NHWC
    _port_dense(twin.cnnMlp[0], base["cnnMlp_0"], perm=_flatten_perm(3, 3, 128))
    _port_dense(twin.cnnMlp[2], base["cnnMlp_1"])
    for i, slot in enumerate((0, 2, 4)):
        _port_dense(twin.motorMlp[slot], base[f"motorMlp_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.imgMotorMlp[slot], base[f"imgMotorMlp_{i}"])
    g = base["gru"]
    twin.gru.weight_ih_l0.data = torch.from_numpy(np.asarray(g["w_ih"]).copy())
    twin.gru.weight_hh_l0.data = torch.from_numpy(np.asarray(g["w_hh"]).copy())
    twin.gru.bias_ih_l0.data = torch.from_numpy(np.asarray(g["b_ih"]).copy())
    twin.gru.bias_hh_l0.data = torch.from_numpy(np.asarray(g["b_hh"]).copy())
    _port_dense(twin.imgMotorMlp2[0], base["imgMotorMlp2_0"])
    for i, slot in enumerate((0, 2, 4)):
        _port_dense(twin.soundMlp[slot], base[f"soundMlp_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.fusionMlp[slot], base[f"fusionMlp_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.mlp_all[slot], base[f"mlp_all_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.actor[slot], base[f"actor_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.critic[slot], base[f"critic_{i}"])
    _port_dense(twin.critic_linear, base["critic_linear"])

    twin.eval()
    with torch.no_grad():
        t_value, t_actor, t_hx = twin(
            torch.from_numpy(np.asarray(obs["image"], np.float32) / 255.0),
            torch.from_numpy(np.asarray(obs["image_feat"])),
            torch.from_numpy(np.asarray(obs["robot_pose"])),
            torch.from_numpy(np.asarray(obs["goal_sound_feat"])),
            torch.from_numpy(np.asarray(hx)),
            torch.from_numpy(np.asarray(masks)))

    np.testing.assert_allclose(np.asarray(value), t_value.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_hx), t_hx.numpy(),
                               rtol=1e-3, atol=1e-4)
    # dist mean comes from the actor features through the gaussian head
    head = variables["params"]["dist_head"]
    mean_twin = t_actor.numpy() @ np.asarray(
        head["Dense_0"]["kernel"]) + np.asarray(head["Dense_0"]["bias"])
    np.testing.assert_allclose(np.asarray(dist.mean), mean_twin,
                               rtol=1e-3, atol=1e-4)


class _ThorCfg(_Cfg):
    RLPolicyBase = "ai2thor_VAR"


class TorchThorPolicy(nn.Module):
    """The reference ai2thor policy stack (ai2thor_RL_model.py:7-115) at
    reduced widths, with the occupancy branch."""

    def __init__(self, rep=3, rin=16, rsize=32, ahid=32):
        super().__init__()
        self.imgCNN = nn.Sequential(
            nn.Conv2d(3, 32, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(32, 32, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(32, 64, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(64, 64, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(64, 128, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(128, 128, 3, 2, 1), nn.ReLU(), nn.Flatten())
        self.occCNN = nn.Sequential(
            nn.Conv2d(1, 64, 3, 2, 1), nn.ReLU(),
            nn.Conv2d(64, 32, 3, 2, 1), nn.ReLU(), nn.Flatten())
        self.occMlp = nn.Sequential(nn.Linear(32 * 9, 128), nn.ReLU(),
                                    nn.Linear(128, 256), nn.ReLU())
        self.cnnMlp = nn.Sequential(nn.Linear(1152, 512), nn.ReLU(),
                                    nn.Linear(512, 256), nn.ReLU())
        self.motorMlp = nn.Sequential(nn.Linear(rep, 64), nn.ReLU(),
                                      nn.Linear(64, 256), nn.ReLU())
        self.imgMotorMlp = nn.Sequential(nn.Linear(256, 64), nn.ReLU(),
                                         nn.Linear(64, rin), nn.ReLU())
        self.gru = nn.GRU(rin, rsize)
        self.imgMotorMlp2 = nn.Sequential(nn.Linear(rsize, 256), nn.ReLU())
        self.soundMlp = nn.Sequential(nn.Linear(rep, 128), nn.ReLU(),
                                      nn.Linear(128, 256), nn.ReLU(),
                                      nn.Linear(256, 256), nn.ReLU())
        self.fusionMlp = nn.Sequential(nn.Linear(256, 512), nn.ReLU(),
                                       nn.Linear(512, 256), nn.ReLU())
        self.mlp_all = nn.Sequential(nn.Linear(256, 256), nn.ReLU(),
                                     nn.Linear(256, 128), nn.ReLU())
        self.actor = nn.Sequential(nn.Linear(128, 128), nn.ReLU(),
                                   nn.Linear(128, ahid), nn.ReLU())
        self.critic = nn.Sequential(nn.Linear(128, 128), nn.ReLU(),
                                    nn.Linear(128, 128), nn.ReLU())
        self.critic_linear = nn.Linear(128, 1)

    def forward(self, image, image_feat, occupancy, sound_feat, hx, masks):
        img = self.cnnMlp(self.imgCNN(image))
        occ = self.occMlp(self.occCNN(occupancy))
        motor = self.motorMlp(image_feat)
        im = self.imgMotorMlp(img + motor + occ)
        out, hx = self.gru(im.unsqueeze(0), (hx * masks).unsqueeze(0))
        imr = self.imgMotorMlp2(out.squeeze(0))
        fusion = self.fusionMlp(self.soundMlp(sound_feat) + img)
        h = self.mlp_all(fusion + imr)
        return self.critic_linear(self.critic(h)), self.actor(h), hx.squeeze(0)


def test_ai2thor_policy_torch_twin():
    cfg = _ThorCfg()
    from var_tpu.envs.spaces import Discrete

    policy = build_policy(cfg, Discrete(8))
    rng = np.random.RandomState(1)
    B = 2
    obs = {
        "image": jnp.asarray((rng.rand(B, 3, 96, 96) * 255).astype(np.uint8)),
        "image_feat": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
        "occupancy": jnp.asarray(
            (rng.rand(B, 1, 9, 9) * 255).astype(np.uint8)),
        "goal_sound_feat": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
    }
    hx = jnp.asarray(rng.randn(B, 32).astype(np.float32))
    masks = jnp.ones((B, 1), jnp.float32)
    variables = policy.init(jax.random.PRNGKey(0), obs, hx, masks, 1)
    value, dist, new_hx = policy.apply(variables, obs, hx, masks, 1)

    base = variables["params"]["base"]
    twin = TorchThorPolicy()
    img_conv_slots = [0, 2, 5, 8, 11, 14]
    for i, slot in enumerate(img_conv_slots):
        _port_conv(twin.imgCNN[slot], base[f"Conv_{i}"])
    # occupancy convs follow the image convs in flax's auto-numbering
    _port_conv(twin.occCNN[0], base["Conv_6"])
    _port_conv(twin.occCNN[2], base["Conv_7"])
    _port_dense(twin.occMlp[0], base["occMlp_0"], perm=_flatten_perm(3, 3, 32))
    _port_dense(twin.occMlp[2], base["occMlp_1"])
    _port_dense(twin.cnnMlp[0], base["cnnMlp_0"], perm=_flatten_perm(3, 3, 128))
    _port_dense(twin.cnnMlp[2], base["cnnMlp_1"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.motorMlp[slot], base[f"motorMlp_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.imgMotorMlp[slot], base[f"imgMotorMlp_{i}"])
    g = base["gru"]
    twin.gru.weight_ih_l0.data = torch.from_numpy(np.asarray(g["w_ih"]).copy())
    twin.gru.weight_hh_l0.data = torch.from_numpy(np.asarray(g["w_hh"]).copy())
    twin.gru.bias_ih_l0.data = torch.from_numpy(np.asarray(g["b_ih"]).copy())
    twin.gru.bias_hh_l0.data = torch.from_numpy(np.asarray(g["b_hh"]).copy())
    _port_dense(twin.imgMotorMlp2[0], base["imgMotorMlp2_0"])
    for i, slot in enumerate((0, 2, 4)):
        _port_dense(twin.soundMlp[slot], base[f"soundMlp_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.fusionMlp[slot], base[f"fusionMlp_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.mlp_all[slot], base[f"mlp_all_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.actor[slot], base[f"actor_{i}"])
    for i, slot in enumerate((0, 2)):
        _port_dense(twin.critic[slot], base[f"critic_{i}"])
    _port_dense(twin.critic_linear, base["critic_linear"])

    twin.eval()
    with torch.no_grad():
        t_value, t_actor, t_hx = twin(
            torch.from_numpy(np.asarray(obs["image"], np.float32) / 255.0),
            torch.from_numpy(np.asarray(obs["image_feat"])),
            torch.from_numpy(np.asarray(obs["occupancy"], np.float32) / 255.0),
            torch.from_numpy(np.asarray(obs["goal_sound_feat"])),
            torch.from_numpy(np.asarray(hx)),
            torch.from_numpy(np.asarray(masks)))

    np.testing.assert_allclose(np.asarray(value), t_value.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_hx), t_hx.numpy(),
                               rtol=1e-3, atol=1e-4)
    head = variables["params"]["dist_head"]
    logits_twin = t_actor.numpy() @ np.asarray(
        head["Dense_0"]["kernel"]) + np.asarray(head["Dense_0"]["bias"])
    np.testing.assert_allclose(np.asarray(dist.logits), logits_twin,
                               rtol=1e-3, atol=1e-4)
