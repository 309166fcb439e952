"""GRU recurrence as lax.scan, numerically matching torch.nn.GRU.

Used by:
- the ai2thor sound encoder's bidirectional GRU
  (reference: models/pretext/ai2thor_pretext_model.py:6,33-38), and
- the recurrent policy, where hidden state is reset at episode boundaries.
  The reference splits the (T,N) sequence at done-mask zeros and multiplies
  the hidden state by the mask at each segment start
  (reference: models/ppo/model.py:116-171); multiplying h by mask[t] at
  *every* step inside one scan is mathematically identical (mask is 1.0
  within segments) and is the XLA-friendly formulation.

Gate math (torch convention, gates ordered r, z, n):
    r = sigmoid(x W_ir^T + b_ir + h W_hr^T + b_hr)
    z = sigmoid(x W_iz^T + b_iz + h W_hz^T + b_hz)
    n = tanh   (x W_in^T + b_in + r * (h W_hn^T + b_hn))
    h' = (1 - z) * n + z * h
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class GRUParams(NamedTuple):
    """Weights in torch layout: w_ih (3H, D), w_hh (3H, H), b_ih/b_hh (3H,)."""

    w_ih: jnp.ndarray
    w_hh: jnp.ndarray
    b_ih: jnp.ndarray
    b_hh: jnp.ndarray

    @property
    def hidden_size(self) -> int:
        return self.w_hh.shape[1]


def init_gru_params(
    key, input_size: int, hidden_size: int, init: str = "torch", dtype=jnp.float32
) -> GRUParams:
    """'torch' = U(-1/sqrt(H), 1/sqrt(H)) (torch.nn.GRU default);
    'orthogonal' = orthogonal weights + zero biases (the reference's policy
    GRU init, models/ppo/model.py:96-101)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    H, D = hidden_size, input_size
    if init == "torch":
        s = 1.0 / np.sqrt(H)
        w_ih = jax.random.uniform(k1, (3 * H, D), dtype, -s, s)
        w_hh = jax.random.uniform(k2, (3 * H, H), dtype, -s, s)
        b_ih = jax.random.uniform(k3, (3 * H,), dtype, -s, s)
        b_hh = jax.random.uniform(k4, (3 * H,), dtype, -s, s)
    elif init == "orthogonal":
        orth = jax.nn.initializers.orthogonal()
        w_ih = orth(k1, (3 * H, D), dtype)
        w_hh = orth(k2, (3 * H, H), dtype)
        b_ih = jnp.zeros((3 * H,), dtype)
        b_hh = jnp.zeros((3 * H,), dtype)
    else:
        raise ValueError(init)
    return GRUParams(w_ih, w_hh, b_ih, b_hh)


def gru_cell(params: GRUParams, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One step. x: (B, D), h: (B, H) -> h': (B, H)."""
    H = params.hidden_size
    gi = x @ params.w_ih.T + params.b_ih  # (B, 3H)
    gh = h @ params.w_hh.T + params.b_hh
    i_r, i_z, i_n = gi[:, :H], gi[:, H : 2 * H], gi[:, 2 * H :]
    h_r, h_z, h_n = gh[:, :H], gh[:, H : 2 * H], gh[:, 2 * H :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_scan(
    params: GRUParams,
    xs: jnp.ndarray,
    h0: jnp.ndarray,
    masks: Optional[jnp.ndarray] = None,
    reverse: bool = False,
):
    """Scan over time. xs: (T, B, D), h0: (B, H), masks: (T, B) or None.

    masks[t] multiplies the carried hidden state *before* step t (1.0 keeps
    it, 0.0 resets at an episode start), matching the reference recurrent
    policy semantics. Returns (outputs (T, B, H), h_final (B, H)).
    """
    if masks is None:

        def step(h, x):
            h = gru_cell(params, x, h)
            return h, h

        h_final, ys = jax.lax.scan(step, h0, xs, reverse=reverse)
    else:

        def step(h, xm):
            x, m = xm
            h = gru_cell(params, x, h * m[:, None])
            return h, h

        h_final, ys = jax.lax.scan(step, h0, (xs, masks), reverse=reverse)
    return ys, h_final


def bigru_final(
    fwd: GRUParams, bwd: GRUParams, xs_btd: jnp.ndarray
) -> jnp.ndarray:
    """Bidirectional GRU returning concat(final_fwd, final_bwd) — exactly the
    reference sound branch's use of torch.nn.GRU(bidirectional=True)
    (ai2thor_pretext_model.py:36-38: rnn_out[0] ⊕ rnn_out[1]).

    xs_btd: (B, T, D) batch-first input. Returns (B, 2H).
    """
    xs = jnp.transpose(xs_btd, (1, 0, 2))  # (T, B, D)
    B = xs.shape[1]
    h0 = jnp.zeros((B, fwd.hidden_size), xs.dtype)
    _, hf = gru_scan(fwd, xs, h0)
    _, hb = gru_scan(bwd, xs, h0, reverse=True)
    return jnp.concatenate([hf, hb], axis=1)
