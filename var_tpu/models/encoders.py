"""VAR pretext encoders (image CNN + sound CNN/CRNN -> shared unit sphere).

Rebuilds of:
- arm VARPretextNet (reference: models/pretext/arm_pretext_model.py:9-59)
- ai2thor VARPretextNet (reference: models/pretext/ai2thor_pretext_model.py:5-64)
- the shared VAR_forward contract (reference: models/pretext/pretext_base.py:6-42)

Differences by design (TPU-first, not a port):
- flax.linen modules with NHWC internal layout (inputs accepted in the
  reference's NCHW obs layout and transposed once at the boundary);
- the goal-sound embedding cache is NOT hidden module state (the reference
  mutates self.cached_sound, pretext_base.py:26-32); callers carry the
  cached embedding explicitly (see var_tpu/rl/reward.py);
- the flattened feature ordering after conv stacks differs from torch's
  NCHW flatten — irrelevant for from-scratch training, noted for clarity.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from var_tpu.ops.gru import GRUParams, bigru_final
from var_tpu.ops.losses import l2_normalize


def _nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


class ArmImageBranch(nn.Module):
    """5x (3x3 stride-2 conv + ReLU): (3,96,96) -> (64,3,3) -> flatten
    (reference: arm_pretext_model.py:9-20)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_nchw):
        x = _nchw_to_nhwc(x_nchw).astype(self.dtype)
        for feat in (32, 32, 64, 64, 64):
            x = nn.Conv(feat, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(x)
            x = nn.relu(x)
        return x.reshape((x.shape[0], -1))  # (B, 3*3*64)


class ArmSoundBranch(nn.Module):
    """Conv stack over (1,100,40) MFCC collapsing the feature axis
    (reference: arm_pretext_model.py:23-34)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_nchw):
        x = _nchw_to_nhwc(x_nchw).astype(self.dtype)  # (B, 100, 40, 1)
        x = nn.relu(nn.Conv(32, (5, 40), strides=(2, 1), padding="VALID",
                            dtype=self.dtype)(x))  # (B, 48, 1, 32)
        for _ in range(3):
            x = nn.relu(nn.Conv(32, (3, 1), strides=(2, 1), padding="VALID",
                                dtype=self.dtype)(x))
        return x.reshape((x.shape[0], -1))  # (B, 5*1*32)


class TripletHead(nn.Module):
    """MLP projection head ending at representationDim, pre-L2-norm
    (reference: arm_pretext_model.py:44-47,53-57;
    ai2thor_pretext_model.py:52-60)."""

    hidden: Tuple[int, ...]
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class AI2ThorImageBranch(nn.Module):
    """VGG-ish 6-conv/4-maxpool stack: (3,96,96) -> (128,3,3) -> flatten
    (reference: ai2thor_pretext_model.py:14-31)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_nchw):
        x = _nchw_to_nhwc(x_nchw).astype(self.dtype)
        x = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 48
        x = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 24
        x = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 12
        x = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 6
        x = nn.relu(nn.Conv(128, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                            dtype=self.dtype)(x))  # 3
        return x.reshape((x.shape[0], -1))  # (B, 3*3*128)


class AI2ThorSoundBranch(nn.Module):
    """CRNN: 3 convs over (1,600,40) -> (73, 7*64) sequence -> BiGRU(448->512),
    concat of final fwd/bwd states -> (B, 1024)
    (reference: ai2thor_pretext_model.py:5-11,33-38)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_nchw):
        x = _nchw_to_nhwc(x_nchw).astype(self.dtype)  # (B, 600, 40, 1)
        x = nn.relu(nn.Conv(64, (11, 11), strides=(2, 2), padding=((5, 5), (5, 5)),
                            dtype=self.dtype)(x))  # (B, 300, 20, 64)
        x = nn.relu(nn.Conv(64, (11, 5), strides=(2, 2), padding=((5, 5), (5, 5)),
                            dtype=self.dtype)(x))  # (B, 150, 13, 64)
        x = nn.relu(nn.Conv(64, (7, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype)(x))  # (B, 73, 7, 64)
        B, T = x.shape[0], x.shape[1]
        seq = x.reshape((B, T, -1))  # (B, 73, 448)

        h = 512
        fwd = GRUParams(
            self.param("gru_fwd_w_ih", _gru_uniform(h), (3 * h, seq.shape[-1])),
            self.param("gru_fwd_w_hh", _gru_uniform(h), (3 * h, h)),
            self.param("gru_fwd_b_ih", _gru_uniform(h), (3 * h,)),
            self.param("gru_fwd_b_hh", _gru_uniform(h), (3 * h,)),
        )
        bwd = GRUParams(
            self.param("gru_bwd_w_ih", _gru_uniform(h), (3 * h, seq.shape[-1])),
            self.param("gru_bwd_w_hh", _gru_uniform(h), (3 * h, h)),
            self.param("gru_bwd_b_ih", _gru_uniform(h), (3 * h,)),
            self.param("gru_bwd_b_hh", _gru_uniform(h), (3 * h,)),
        )
        return bigru_final(fwd, bwd, seq.astype(jnp.float32)).astype(self.dtype)


def _gru_uniform(hidden_size: int) -> Callable:
    s = 1.0 / jnp.sqrt(hidden_size)

    def init(key, shape):
        return jax.random.uniform(key, shape, jnp.float32, -s, s)

    return init


class VARPretextNet(nn.Module):
    """Shared VAR contract: encode_image / encode_sound both project onto the
    L2-normalized representation sphere (reference: pretext_base.py:10-42).

    `variant` selects the arm conv/conv or ai2thor conv/CRNN architecture.
    """

    variant: str  # 'arm' | 'ai2thor'
    representation_dim: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        if self.variant == "arm":
            self.img_branch = ArmImageBranch(dtype=self.dtype)
            self.sound_branch = ArmSoundBranch(dtype=self.dtype)
            self.img_triplet = TripletHead((128,), self.representation_dim, self.dtype)
            self.sound_triplet = TripletHead((128,), self.representation_dim, self.dtype)
        elif self.variant == "ai2thor":
            self.img_branch = AI2ThorImageBranch(dtype=self.dtype)
            self.sound_branch = AI2ThorSoundBranch(dtype=self.dtype)
            self.img_triplet = TripletHead((128,), self.representation_dim, self.dtype)
            # reference: soundTriplet is 1024->128->64->D
            self.sound_triplet = TripletHead((128, 64), self.representation_dim, self.dtype)
        else:
            raise ValueError(self.variant)

    def encode_image(self, image_nchw):
        """image (B,3,96,96) scaled to [0,1] -> (raw_feat, sphere_feat)."""
        raw = self.img_branch(image_nchw[:, :3])
        feat = l2_normalize(self.img_triplet(raw).astype(jnp.float32))
        return raw, feat

    def encode_sound(self, sound_nchw):
        """sound (B,1,T,40) MFCC -> (raw_feat, sphere_feat)."""
        raw = self.sound_branch(sound_nchw)
        feat = l2_normalize(self.sound_triplet(raw).astype(jnp.float32))
        return raw, feat

    def __call__(self, image, sound_positive, sound_negative) -> Dict[str, Any]:
        """Training forward over a triplet batch. Mirrors VAR_forward's
        output dict (keys kept for familiarity) minus the hidden cache."""
        out = {}
        image_feat_raw, image_feat = self.encode_image(image)
        pos_raw, pos_feat = self.encode_sound(sound_positive)
        out.update(
            image_feat=image_feat, image_feat_raw=image_feat_raw,
            sound_feat_positive=pos_feat, pos_sound_raw=pos_raw,
        )
        if sound_negative is not None:
            _, neg_feat = self.encode_sound(sound_negative)
            out["sound_feat_negative"] = neg_feat
        return out


# ---------------------------------------------------------------------------
# registry (configs reference models by string key)

_MODEL_REGISTRY = {
    "arm_VARPretextNet": lambda config: VARPretextNet(
        variant="arm",
        representation_dim=config.representationDim,
        dtype=jnp.dtype(getattr(config, "computeDtype", "float32")),
    ),
    "ai2thor_VARPretextNet": lambda config: VARPretextNet(
        variant="ai2thor",
        representation_dim=config.representationDim,
        dtype=jnp.dtype(getattr(config, "computeDtype", "float32")),
    ),
}


def build_pretext_model(config) -> VARPretextNet:
    key = config.pretextModel
    if key not in _MODEL_REGISTRY:
        raise KeyError(f"Unknown pretext model {key!r}; have {sorted(_MODEL_REGISTRY)}")
    return _MODEL_REGISTRY[key](config)


def init_pretext_params(model: VARPretextNet, config, rng_key):
    img = jnp.zeros((1,) + tuple(config.img_dim), jnp.float32)
    snd = jnp.zeros((1,) + tuple(config.sound_dim), jnp.float32)
    return model.init(rng_key, img, snd, snd)
