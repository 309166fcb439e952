"""Embedding plot export smoke tests (reference: pretext.py:205-265)."""
import os

import numpy as np

from var_tpu.utils.plotting import plot_representation


def _points(n=40, d=3):
    rng = np.random.RandomState(0)
    pts = rng.randn(n, d)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    labels = rng.randint(0, 5, size=(n, 1)).astype(float)
    return np.concatenate([pts, labels], axis=1)


def test_sphere_plot_3d(tmp_path):
    out = os.path.join(str(tmp_path), "rep.png")
    path = plot_representation(
        {"img": _points(), "sound": _points(20)}, 3, out)
    assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_tsne_plot_highdim(tmp_path):
    out = os.path.join(str(tmp_path), "rep_tsne.png")
    path = plot_representation(
        {"img": _points(d=8), "sound": _points(30, d=8)}, 8, out)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
