"""Actor-critic policy networks.

Rebuilds of the reference policy stack:
- Policy wrapper dispatching base nets by name and distribution heads by
  action space (reference: models/ppo/model.py:15-82),
- NNBase GRU recurrence with done-mask resets (model.py:85-171) — here a
  single masked lax.scan handles both the one-step and (T,N)-sequence
  cases,
- armNet_VAR (reference: models/RL/arm_RL_model.py:41-134) and
  ai2thorNet_VAR (models/RL/ai2thor_RL_model.py:7-115) fusion
  architectures: image CNN + VAR-embedding motor branch (+ occupancy
  branch for ai2thor) fused by residual additions around the GRU, with a
  goal-sound-embedding branch added after, separate actor/critic heads.

Orthogonal init with the reference's gains on every Linear
(sqrt(2) relu gain; 0.01 on the categorical head; orthogonal+zero-bias on
the GRU), flax defaults on the conv stacks (the reference likewise leaves
its conv stacks at torch defaults).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from var_tpu.models.distributions import (
    DistParams,
    entropy,
    log_probs,
    make_head,
    mode,
    orthogonal_dense,
    sample,
)
from var_tpu.ops.gru import GRUParams, gru_scan

SQRT2 = 1.4142135623730951


def _mlp(x, sizes, name_prefix):
    for i, h in enumerate(sizes):
        x = nn.relu(orthogonal_dense(h, SQRT2, name=f"{name_prefix}_{i}")(x))
    return x


def _nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _norm_img(x, dtype):
    """Accept uint8 (raw pixels; normalized here so transfers/storage stay
    4x smaller) or float (already in [0, 1], the reward wrapper's output)."""
    if x.dtype == jnp.uint8:
        return x.astype(dtype) * (1.0 / 255.0)
    return x.astype(dtype)


class _PolicyGRU(nn.Module):
    """Recurrent core: orthogonal weights, zero biases (model.py:96-101)."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, xs_flat, rnn_hx, masks_flat, seq_len: int):
        """xs_flat: (T*N, D); rnn_hx: (N, H); masks_flat: (T*N, 1).

        Returns (outputs (T*N, H), new_hx (N, H)). For seq_len == 1 this is
        the reference's single-step path (h * mask then one cell); for
        longer sequences the per-step mask multiply inside the scan equals
        the reference's split-at-zeros segmenting (see ops/gru.py).
        """
        orth = jax.nn.initializers.orthogonal()
        params = GRUParams(
            self.param("w_ih", orth, (3 * self.hidden_size, self.input_size)),
            self.param("w_hh", orth, (3 * self.hidden_size, self.hidden_size)),
            self.param("b_ih", jax.nn.initializers.zeros, (3 * self.hidden_size,)),
            self.param("b_hh", jax.nn.initializers.zeros, (3 * self.hidden_size,)),
        )
        N = rnn_hx.shape[0]
        T = seq_len
        xs = xs_flat.reshape(T, N, -1)
        masks = masks_flat.reshape(T, N)
        ys, h_final = gru_scan(params, xs, rnn_hx, masks=masks)
        return ys.reshape(T * N, -1), h_final


class ArmPolicyBase(nn.Module):
    """armNet_VAR (reference: models/RL/arm_RL_model.py:41-134)."""

    representation_dim: int = 3
    robot_state_dim: int = 2
    recurrent: bool = True
    recurrent_input_size: int = 128
    recurrent_size: int = 512
    action_hidden_size: int = 128
    img_width: int = 96  # 96 default; !=96 selects the 120x160 camera path
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], rnn_hx, masks, seq_len: int = 1):
        image = _norm_img(obs["image"], self.dtype)
        image_feat = obs["image_feat"]
        robot_pose = obs["robot_pose"]
        goal_sound_feat = obs["goal_sound_feat"]

        x = _nchw_to_nhwc(image)
        if self.img_width != 96:
            # raw-camera path (reference arm_RL_model.py:8-19: 120x160 input)
            x = nn.relu(nn.Conv(64, (7, 7), strides=2, padding=((1, 1), (1, 1)),
                                dtype=self.dtype)(x))
            x = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                                dtype=self.dtype)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                                dtype=self.dtype)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                                dtype=self.dtype)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(nn.Conv(512, (3, 3), padding=((1, 1), (1, 1)),
                                dtype=self.dtype)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        else:
            # 96x96 path (reference arm_RL_model.py:21-35)
            x = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
            x = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 48
            x = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
            x = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 24
            x = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
            x = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 12
            x = nn.relu(nn.Conv(256, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(x))  # 5
            x = nn.relu(nn.Conv(128, (3, 3), padding="VALID", dtype=self.dtype)(x))  # 3
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)

        image_flatten = _mlp(x, (512, 256), "cnnMlp")
        motor_img = jnp.concatenate([image_feat, robot_pose], axis=1)
        motor = _mlp(motor_img, (256, 512, 256), "motorMlp")
        image_motor = _mlp(image_flatten + motor, (256, self.recurrent_input_size),
                           "imgMotorMlp")

        if self.recurrent:
            image_motor, rnn_hx = _PolicyGRU(
                self.recurrent_input_size, self.recurrent_size, name="gru"
            )(image_motor, rnn_hx, masks, seq_len)

        image_motor_rnn = _mlp(image_motor, (256,), "imgMotorMlp2")
        sound = _mlp(goal_sound_feat, (128, 256, 256), "soundMlp")
        fusion = _mlp(sound + image_flatten, (512, 256), "fusionMlp")
        final = fusion + image_motor_rnn
        h = _mlp(final, (256, 128), "mlp_all")

        hidden_actor = _mlp(h, (128, self.action_hidden_size), "actor")
        hidden_critic = _mlp(h, (128, 128), "critic")
        value = orthogonal_dense(1, SQRT2, name="critic_linear")(hidden_critic)
        return value, hidden_actor, rnn_hx


class AI2ThorPolicyBase(nn.Module):
    """ai2thorNet_VAR (reference: models/RL/ai2thor_RL_model.py:7-115)."""

    representation_dim: int = 3
    recurrent: bool = True
    recurrent_input_size: int = 128
    recurrent_size: int = 1024
    action_hidden_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], rnn_hx, masks, seq_len: int = 1):
        image = _norm_img(obs["image"], self.dtype)
        image_feat = obs["image_feat"]
        occupancy = _norm_img(obs["occupancy"], self.dtype)
        goal_sound_feat = obs["goal_sound_feat"]

        x = _nchw_to_nhwc(image)
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
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)

        # occupancy branch (1,9,9) -> convs -> MLP 288->128->256
        o = _nchw_to_nhwc(occupancy)
        o = nn.relu(nn.Conv(64, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                            dtype=self.dtype)(o))  # 5
        o = nn.relu(nn.Conv(32, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                            dtype=self.dtype)(o))  # 3
        o = o.reshape((o.shape[0], -1)).astype(jnp.float32)
        o = nn.relu(nn.Dense(128, name="occMlp_0")(o))
        occupancy_feat = nn.relu(nn.Dense(256, name="occMlp_1")(o))

        image_flatten = _mlp(x, (512, 256), "cnnMlp")
        motor = _mlp(image_feat, (64, 256), "motorMlp")
        image_motor = _mlp(image_flatten + motor + occupancy_feat,
                           (64, self.recurrent_input_size), "imgMotorMlp")

        if self.recurrent:
            image_motor, rnn_hx = _PolicyGRU(
                self.recurrent_input_size, self.recurrent_size, name="gru"
            )(image_motor, rnn_hx, masks, seq_len)

        image_motor_rnn = _mlp(image_motor, (256,), "imgMotorMlp2")
        sound = _mlp(goal_sound_feat, (128, 256, 256), "soundMlp")
        fusion = _mlp(sound + image_flatten, (512, 256), "fusionMlp")
        final = fusion + image_motor_rnn
        h = _mlp(final, (256, 128), "mlp_all")

        hidden_actor = _mlp(h, (128, self.action_hidden_size), "actor")
        hidden_critic = _mlp(h, (128, 128), "critic")
        value = orthogonal_dense(1, SQRT2, name="critic_linear")(hidden_critic)
        return value, hidden_actor, rnn_hx


_BASE_REGISTRY = {
    "arm_VAR": ArmPolicyBase,
    "ai2thor_VAR": AI2ThorPolicyBase,
}


class Policy(nn.Module):
    """Actor-critic wrapper (reference: models/ppo/model.py:15-82)."""

    base_name: str
    action_space: Any
    representation_dim: int = 3
    robot_state_dim: int = 2
    recurrent: bool = True
    recurrent_input_size: int = 128
    recurrent_size: int = 512
    action_hidden_size: int = 128
    img_width: int = 96
    dtype: Any = jnp.float32

    def setup(self):
        cls = _BASE_REGISTRY[self.base_name]
        kwargs = dict(
            representation_dim=self.representation_dim,
            recurrent=self.recurrent,
            recurrent_input_size=self.recurrent_input_size,
            recurrent_size=self.recurrent_size,
            action_hidden_size=self.action_hidden_size,
            dtype=self.dtype,
        )
        if cls is ArmPolicyBase:
            kwargs["robot_state_dim"] = self.robot_state_dim
            kwargs["img_width"] = self.img_width
        self.base = cls(**kwargs)
        self.dist_head = make_head(self.action_space)

    @property
    def recurrent_hidden_state_size(self) -> int:
        return self.recurrent_size if self.recurrent else 1

    def __call__(self, obs, rnn_hx, masks, seq_len: int = 1):
        value, actor_features, rnn_hx = self.base(obs, rnn_hx, masks, seq_len)
        dist = self.dist_head(actor_features)
        return value, dist, rnn_hx


class PolicyStep(NamedTuple):
    value: jnp.ndarray  # (B, 1)
    action: jnp.ndarray
    action_log_prob: jnp.ndarray  # (B, 1)
    rnn_hx: jnp.ndarray  # (N, H)


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("deterministic",))
def act(model: Policy, variables, obs, rnn_hx, masks, key, deterministic=False) -> PolicyStep:
    """One rollout step (reference: model.py:57-68). Jitted with the model
    as a static argument (one compile per model architecture / batch
    shape); eager per-op dispatch is far too slow for the per-step eval
    and wrapped-rollout loops, especially over a remote-device link."""
    value, dist, new_hx = model.apply(variables, obs, rnn_hx, masks, 1)
    action = mode(dist) if deterministic else sample(dist, key)
    return PolicyStep(value, action, log_probs(dist, action), new_hx)


@functools.partial(jax.jit, static_argnums=(0,))
def get_value(model: Policy, variables, obs, rnn_hx, masks) -> jnp.ndarray:
    value, _, _ = model.apply(variables, obs, rnn_hx, masks, 1)
    return value


def evaluate_actions(
    model: Policy, variables, obs, rnn_hx, masks, actions, seq_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(values (TB,1), action_log_probs (TB,1), mean entropy) over a
    flattened (T*N) minibatch (reference: model.py:75-82)."""
    value, dist, _ = model.apply(variables, obs, rnn_hx, masks, seq_len)
    return value, log_probs(dist, actions), jnp.mean(entropy(dist))


def build_policy(config, action_space) -> Policy:
    """Construct from config knobs (reference: RL.py:99-110)."""
    return Policy(
        base_name=config.RLPolicyBase,
        action_space=action_space,
        representation_dim=config.representationDim,
        robot_state_dim=getattr(config, "robotStateDim", 2),
        recurrent=config.RLRecurrentPolicy,
        recurrent_input_size=config.RLRecurrentInputSize,
        recurrent_size=config.RLRecurrentSize,
        action_hidden_size=config.RLActionHiddenSize,
        img_width=getattr(config, "img_dim", (3, 96, 96))[-1],
        dtype=jnp.dtype(getattr(config, "computeDtype", "float32")),
    )
