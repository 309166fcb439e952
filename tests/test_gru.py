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


def test_gru_long_sequence_drift_is_accumulation_order():
    """The BASELINE.md parity amendment's evidence: at the CRNN's real
    sequence length (600 steps, H=512-class widths scaled down) the f32
    torch-vs-scan drift is accumulation-order noise, not a math bug — the
    SAME weights and inputs in f64 agree to ~1e-12, far below the f32 gap.
    This pins the ai2thor CRNN rtol=1e-3 relaxation (tests
    test_torch_parity.py::test_ai2thor_var_torch_twin_embeddings_match) on
    float32 reduction-order divergence between cuDNN-style torch GRU and
    the lax.scan form."""
    import jax
    enable_x64 = jax.enable_x64

    D, H, B, T = 32, 64, 2, 600
    gru = _torch_gru(D, H, seed=5).double()
    names = ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0")
    w64 = [getattr(gru, n).detach().numpy() for n in names]
    params32 = GRUParams(*[jnp.asarray(w.astype(np.float32)) for w in w64])
    rng = np.random.RandomState(5)
    xs = rng.randn(T, B, D)
    h0 = np.zeros((B, H))

    with torch.no_grad():
        _, hn64 = gru(torch.from_numpy(xs), torch.from_numpy(h0)[None])
        g32 = gru.float()
        _, hn32 = g32(torch.from_numpy(xs.astype(np.float32)),
                      torch.from_numpy(h0.astype(np.float32))[None])

    with enable_x64():  # without x64, jnp silently downcasts f64 -> f32
        params64 = GRUParams(*[jnp.asarray(w, dtype=jnp.float64)
                               for w in w64])
        _, hf64 = gru_scan(params64, jnp.asarray(xs, dtype=jnp.float64),
                           jnp.asarray(h0, dtype=jnp.float64))
        hf64 = np.asarray(hf64)
    _, hf32 = gru_scan(params32, jnp.asarray(xs.astype(np.float32)),
                       jnp.asarray(h0.astype(np.float32)))

    drift64 = float(np.max(np.abs(hf64 - hn64[0].numpy())))
    drift32 = float(np.max(np.abs(np.asarray(hf32) - hn32[0].numpy())))
    # f64: both frameworks agree to near machine precision over 600 steps
    assert drift64 < 1e-10, drift64
    # f32: the drift exists (or is at least allowed for) and is what the
    # relaxed CRNN tolerance absorbs; it must stay well inside that band
    assert drift32 < 2e-4, drift32
