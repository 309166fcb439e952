"""Embedding visualization (headless).

Rebuild of the reference's plotRepresentation (reference: pretext.py:205-265):
3-D scatter of image/sound embeddings on the unit sphere colored by class,
t-SNE projection when representationDim > 3. Saves to file instead of
opening a TkAgg window.
"""
from __future__ import annotations

import numpy as np


def plot_representation(points: dict, representation_dim: int, out_path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = points["img"]
    sound = points["sound"]

    if representation_dim > 3:
        from sklearn.manifold import TSNE

        all_pts = np.concatenate([img[:, :-1], sound[:, :-1]], axis=0)
        emb = TSNE(n_components=2, init="pca").fit_transform(all_pts)
        fig, ax = plt.subplots(figsize=(6, 6))
        n = len(img)
        ax.scatter(emb[:n, 0], emb[:n, 1], c=img[:, -1], marker="o",
                   cmap="tab10", alpha=0.6, label="image")
        ax.scatter(emb[n:, 0], emb[n:, 1], c=sound[:, -1], marker="^",
                   cmap="tab10", alpha=0.6, label="sound")
        ax.legend()
    else:
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
        # unit sphere wireframe
        u, v = np.mgrid[0 : 2 * np.pi : 24j, 0 : np.pi : 12j]
        ax.plot_wireframe(
            np.cos(u) * np.sin(v), np.sin(u) * np.sin(v), np.cos(v),
            color="lightgray", linewidth=0.3,
        )
        ax.scatter(img[:, 0], img[:, 1], img[:, 2], c=img[:, -1],
                   marker="o", cmap="tab10", alpha=0.7, label="image")
        ax.scatter(sound[:, 0], sound[:, 1], sound[:, 2], c=sound[:, -1],
                   marker="^", cmap="tab10", s=60, label="sound")
        ax.legend()
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
