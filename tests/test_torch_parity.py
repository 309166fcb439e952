"""PyTorch reference-parity harness (SURVEY §7.9 / BASELINE north star).

The reference ships no trained weights, so parity is established
structurally: build a PyTorch twin of the arm VARPretextNet with the
reference's exact layer stack (models/pretext/arm_pretext_model.py), port
OUR flax parameters into it (handling the NHWC->NCHW kernel layout and the
flatten-order permutation), and require the embeddings — and therefore the
VAR rewards, which are dot products of embeddings — to agree within 1e-4.
This proves the architectures and numerics are the same function, which is
the property weight-level porting would rely on.
"""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from var_tpu.models.encoders import VARPretextNet


class TorchArmVAR(nn.Module):
    """The reference arm VARPretextNet layer stack
    (arm_pretext_model.py:9-59)."""

    def __init__(self, rep_dim=3):
        super().__init__()
        chans = [3, 32, 32, 64, 64, 64]
        conv = []
        for i in range(5):
            conv += [nn.Conv2d(chans[i], chans[i + 1], 3, stride=2, padding=1),
                     nn.ReLU()]
        self.imgBranch = nn.Sequential(*conv, nn.Flatten())
        self.imgTriplet = nn.Sequential(
            nn.Linear(64 * 9, 128), nn.ReLU(), nn.Linear(128, rep_dim))
        self.soundCNN = nn.Sequential(
            nn.Conv2d(1, 32, (5, 40), stride=(2, 1)), nn.ReLU(),
            nn.Conv2d(32, 32, (3, 1), stride=(2, 1)), nn.ReLU(),
            nn.Conv2d(32, 32, (3, 1), stride=(2, 1)), nn.ReLU(),
            nn.Conv2d(32, 32, (3, 1), stride=(2, 1)), nn.ReLU(),
            nn.Flatten())
        self.soundTriplet = nn.Sequential(
            nn.Linear(32 * 5, 128), nn.ReLU(), nn.Linear(128, rep_dim))

    def forward(self, image, sound):
        f = nn.functional.normalize
        img = f(self.imgTriplet(self.imgBranch(image)), p=2, dim=1)
        snd = f(self.soundTriplet(self.soundCNN(sound)), p=2, dim=1)
        return img, snd


def _port_conv(t_conv: nn.Conv2d, kernel, bias):
    # flax kernel (H, W, I, O) -> torch (O, I, H, W)
    t_conv.weight.data = torch.from_numpy(
        np.transpose(np.asarray(kernel), (3, 2, 0, 1)).copy())
    t_conv.bias.data = torch.from_numpy(np.asarray(bias).copy())


def _port_dense(t_lin: nn.Linear, kernel, bias, perm=None):
    # flax kernel (in, out) -> torch (out, in); perm reorders the input
    # features (flatten-order difference after conv stacks)
    k = np.asarray(kernel)
    if perm is not None:
        k = k[perm]
    t_lin.weight.data = torch.from_numpy(k.T.copy())
    t_lin.bias.data = torch.from_numpy(np.asarray(bias).copy())


def _flatten_perm(h, w, c):
    """Map torch flatten index (c, h, w order) -> flax flatten index
    (h, w, c order): perm[i_torch] = i_flax."""
    idx = np.arange(h * w * c).reshape(h, w, c)  # flax NHWC flatten
    return np.transpose(idx, (2, 0, 1)).reshape(-1)  # torch CHW order


def test_arm_var_torch_twin_embeddings_match():
    model = VARPretextNet(variant="arm", representation_dim=3)
    rng = np.random.RandomState(0)
    img = rng.rand(4, 3, 96, 96).astype(np.float32)
    snd = (rng.randn(4, 1, 100, 40) * 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                           jnp.asarray(snd), jnp.asarray(snd))
    params = variables["params"]

    out = model.apply(variables, jnp.asarray(img), jnp.asarray(snd), None)
    jax_img = np.asarray(out["image_feat"])
    jax_snd = np.asarray(out["sound_feat_positive"])

    twin = TorchArmVAR()
    ib = params["img_branch"]
    for i in range(5):
        _port_conv(twin.imgBranch[2 * i], ib[f"Conv_{i}"]["kernel"],
                   ib[f"Conv_{i}"]["bias"])
    it = params["img_triplet"]
    _port_dense(twin.imgTriplet[0], it["Dense_0"]["kernel"],
                it["Dense_0"]["bias"], perm=_flatten_perm(3, 3, 64))
    _port_dense(twin.imgTriplet[2], it["Dense_1"]["kernel"],
                it["Dense_1"]["bias"])
    sb = params["sound_branch"]
    for i in range(4):
        _port_conv(twin.soundCNN[2 * i], sb[f"Conv_{i}"]["kernel"],
                   sb[f"Conv_{i}"]["bias"])
    st = params["sound_triplet"]
    _port_dense(twin.soundTriplet[0], st["Dense_0"]["kernel"],
                st["Dense_0"]["bias"], perm=_flatten_perm(5, 1, 32))
    _port_dense(twin.soundTriplet[2], st["Dense_1"]["kernel"],
                st["Dense_1"]["bias"])

    twin.eval()
    with torch.no_grad():
        t_img, t_snd = twin(torch.from_numpy(img), torch.from_numpy(snd))

    np.testing.assert_allclose(jax_img, t_img.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(jax_snd, t_snd.numpy(), rtol=1e-4, atol=1e-4)

    # and therefore the VAR reward (dot product) agrees within 1e-4
    jax_reward = np.sum(jax_img * jax_snd, axis=1)
    t_reward = (t_img * t_snd).sum(dim=1).numpy()
    np.testing.assert_allclose(jax_reward, t_reward, rtol=1e-4, atol=1e-4)


class TorchThorVAR(nn.Module):
    """The reference ai2thor VARPretextNet layer stack
    (ai2thor_pretext_model.py:5-64), with the CNN->RNN reshape adapted to
    our NHWC feature ordering (w*c instead of c*w — same function once
    weights are ported consistently)."""

    def __init__(self, rep_dim=3):
        super().__init__()
        self.imgBranch = nn.Sequential(
            nn.Conv2d(3, 32, 3, padding=1), nn.ReLU(),
            nn.Conv2d(32, 32, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(32, 64, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(128, 128, 3, stride=2, padding=1), nn.ReLU(),
            nn.Flatten())
        self.imgTriplet = nn.Sequential(
            nn.Linear(128 * 9, 128), nn.ReLU(), nn.Linear(128, rep_dim))
        self.cnn = nn.Sequential(
            nn.Conv2d(1, 64, (11, 11), stride=2, padding=(5, 5)), nn.ReLU(),
            nn.Conv2d(64, 64, (11, 5), stride=2, padding=(5, 5)), nn.ReLU(),
            nn.Conv2d(64, 64, (7, 3), stride=2, padding=(1, 1)), nn.ReLU())
        self.rnn = nn.GRU(64 * 7, 512, batch_first=True, bidirectional=True)
        self.soundTriplet = nn.Sequential(
            nn.Linear(1024, 128), nn.ReLU(),
            nn.Linear(128, 64), nn.ReLU(),
            nn.Linear(64, rep_dim))

    def forward(self, image, sound):
        f = nn.functional.normalize
        img = f(self.imgTriplet(self.imgBranch(image)), p=2, dim=1)
        c = self.cnn(sound)  # (B, 64, 73, 7) NCHW
        # match our NHWC sequence layout: (B, T=73, W=7, C=64) -> (B, 73, 448)
        seq = c.permute(0, 2, 3, 1).reshape(-1, 73, 7 * 64)
        _, h = self.rnn(seq)
        rnn_out = torch.cat((h[0], h[1]), dim=1)
        snd = f(self.soundTriplet(rnn_out), p=2, dim=1)
        return img, snd


def test_ai2thor_var_torch_twin_embeddings_match():
    model = VARPretextNet(variant="ai2thor", representation_dim=3)
    rng = np.random.RandomState(1)
    img = rng.rand(2, 3, 96, 96).astype(np.float32)
    snd = (rng.randn(2, 1, 600, 40) * 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                           jnp.asarray(snd), jnp.asarray(snd))
    params = variables["params"]

    out = model.apply(variables, jnp.asarray(img), jnp.asarray(snd), None)
    jax_img = np.asarray(out["image_feat"])
    jax_snd = np.asarray(out["sound_feat_positive"])

    twin = TorchThorVAR()
    ib = params["img_branch"]
    conv_slots = [0, 2, 5, 8, 11, 14]  # Conv2d positions in the Sequential
    for i, slot in enumerate(conv_slots):
        _port_conv(twin.imgBranch[slot], ib[f"Conv_{i}"]["kernel"],
                   ib[f"Conv_{i}"]["bias"])
    it = params["img_triplet"]
    _port_dense(twin.imgTriplet[0], it["Dense_0"]["kernel"],
                it["Dense_0"]["bias"], perm=_flatten_perm(3, 3, 128))
    _port_dense(twin.imgTriplet[2], it["Dense_1"]["kernel"],
                it["Dense_1"]["bias"])

    sb = params["sound_branch"]
    for i in range(3):
        _port_conv(twin.cnn[2 * i], sb[f"Conv_{i}"]["kernel"],
                   sb[f"Conv_{i}"]["bias"])
    # GRU weights: our GRUParams layout IS the torch layout
    twin.rnn.weight_ih_l0.data = torch.from_numpy(
        np.asarray(sb["gru_fwd_w_ih"]).copy())
    twin.rnn.weight_hh_l0.data = torch.from_numpy(
        np.asarray(sb["gru_fwd_w_hh"]).copy())
    twin.rnn.bias_ih_l0.data = torch.from_numpy(
        np.asarray(sb["gru_fwd_b_ih"]).copy())
    twin.rnn.bias_hh_l0.data = torch.from_numpy(
        np.asarray(sb["gru_fwd_b_hh"]).copy())
    twin.rnn.weight_ih_l0_reverse.data = torch.from_numpy(
        np.asarray(sb["gru_bwd_w_ih"]).copy())
    twin.rnn.weight_hh_l0_reverse.data = torch.from_numpy(
        np.asarray(sb["gru_bwd_w_hh"]).copy())
    twin.rnn.bias_ih_l0_reverse.data = torch.from_numpy(
        np.asarray(sb["gru_bwd_b_ih"]).copy())
    twin.rnn.bias_hh_l0_reverse.data = torch.from_numpy(
        np.asarray(sb["gru_bwd_b_hh"]).copy())
    st = params["sound_triplet"]
    for i, slot in enumerate((0, 2, 4)):
        _port_dense(twin.soundTriplet[slot], st[f"Dense_{i}"]["kernel"],
                    st[f"Dense_{i}"]["bias"])

    twin.eval()
    with torch.no_grad():
        t_img, t_snd = twin(torch.from_numpy(img), torch.from_numpy(snd))

    np.testing.assert_allclose(jax_img, t_img.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(jax_snd, t_snd.numpy(), rtol=1e-3, atol=2e-4)
