"""GRU parity tests against torch.nn.GRU."""
import numpy as np
import torch

import jax.numpy as jnp

from var_tpu.ops.gru import GRUParams, bigru_final, gru_cell, gru_scan


def _torch_gru(input_size, hidden_size, bidirectional=False, seed=0):
    torch.manual_seed(seed)
    return torch.nn.GRU(
        input_size, hidden_size, batch_first=False, bidirectional=bidirectional
    )


def _params_from_torch(gru, suffix=""):
    return GRUParams(
        w_ih=jnp.asarray(getattr(gru, f"weight_ih_l0{suffix}").detach().numpy()),
        w_hh=jnp.asarray(getattr(gru, f"weight_hh_l0{suffix}").detach().numpy()),
        b_ih=jnp.asarray(getattr(gru, f"bias_ih_l0{suffix}").detach().numpy()),
        b_hh=jnp.asarray(getattr(gru, f"bias_hh_l0{suffix}").detach().numpy()),
    )


def test_gru_cell_matches_torch():
    D, H, B = 7, 5, 3
    gru = _torch_gru(D, H)
    params = _params_from_torch(gru)
    rng = np.random.RandomState(0)
    x = rng.randn(B, D).astype(np.float32)
    h = rng.randn(B, H).astype(np.float32)
    with torch.no_grad():
        out, hn = gru(torch.from_numpy(x)[None], torch.from_numpy(h)[None])
    ours = np.asarray(gru_cell(params, jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(ours, hn[0].numpy(), rtol=1e-5, atol=1e-5)


def test_gru_scan_matches_torch_sequence():
    D, H, B, T = 6, 4, 2, 11
    gru = _torch_gru(D, H, seed=1)
    params = _params_from_torch(gru)
    rng = np.random.RandomState(1)
    xs = rng.randn(T, B, D).astype(np.float32)
    h0 = rng.randn(B, H).astype(np.float32)
    with torch.no_grad():
        out, hn = gru(torch.from_numpy(xs), torch.from_numpy(h0)[None])
    ys, hf = gru_scan(params, jnp.asarray(xs), jnp.asarray(h0))
    np.testing.assert_allclose(np.asarray(ys), out.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), hn[0].numpy(), rtol=1e-5, atol=1e-5)


def test_masked_scan_matches_reference_segmenting():
    """Per-step h*mask must equal the reference's split-at-zeros approach
    (models/ppo/model.py:116-171)."""
    D, H, B, T = 5, 3, 4, 9
    gru = _torch_gru(D, H, seed=2)
    params = _params_from_torch(gru)
    rng = np.random.RandomState(2)
    xs = rng.randn(T, B, D).astype(np.float32)
    h0 = rng.randn(B, H).astype(np.float32)
    masks = (rng.rand(T, B) > 0.3).astype(np.float32)
    masks[0] = 0.0  # reference: t=0 always has a reset

    # golden: torch loop with per-step mask multiply (equivalent to the
    # reference's segment splitting because mask==1 inside segments)
    h = torch.from_numpy(h0)
    outs = []
    with torch.no_grad():
        for t in range(T):
            x_t = torch.from_numpy(xs[t : t + 1])
            h = h * torch.from_numpy(masks[t])[:, None]
            o, hn = gru(x_t, h[None])
            h = hn[0]
            outs.append(o[0].numpy())
    golden = np.stack(outs)

    ys, hf = gru_scan(params, jnp.asarray(xs), jnp.asarray(h0), masks=jnp.asarray(masks))
    np.testing.assert_allclose(np.asarray(ys), golden, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), golden[-1], rtol=1e-5, atol=1e-5)


def test_bigru_final_matches_torch():
    D, H, B, T = 8, 6, 3, 12
    gru = _torch_gru(D, H, bidirectional=True, seed=3)
    fwd = _params_from_torch(gru)
    bwd = _params_from_torch(gru, suffix="_reverse")
    rng = np.random.RandomState(3)
    xs = rng.randn(B, T, D).astype(np.float32)
    with torch.no_grad():
        # torch batch_first=False: input (T, B, D)
        _, hn = gru(torch.from_numpy(np.transpose(xs, (1, 0, 2))))
    golden = np.concatenate([hn[0].numpy(), hn[1].numpy()], axis=1)
    ours = np.asarray(bigru_final(fwd, bwd, jnp.asarray(xs)))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)
