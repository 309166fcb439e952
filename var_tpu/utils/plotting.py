"""Embedding visualization (headless).

Rebuild of the reference's plotRepresentation (reference: pretext.py:205-265):
3-D scatter of image/sound embeddings on the unit sphere colored by class,
t-SNE projection when representationDim > 3. Saves to file instead of
opening a TkAgg window.
"""
from __future__ import annotations

import numpy as np


def plot_representation(points: dict, representation_dim: int, out_path: str):
    # Render on a LOCAL Agg canvas: matplotlib.use() would switch the
    # process-global backend and close every open figure (killing a live
    # realTimeVec window); pyplot is only used for figure construction
    # here and the figure is always closed.
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


def _first3(v: np.ndarray) -> np.ndarray:
    """First 3 components, re-normalized when the embedding is higher-D
    (keeps the arrow on the unit sphere)."""
    if len(v) <= 3:
        return v
    v3 = v[:3]
    n = np.linalg.norm(v3)
    return v3 / n if n > 1e-9 else v3


def display_available() -> bool:
    """True when an interactive matplotlib window can be opened."""
    import os

    return bool(os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY"))


class RealTimeEmbeddingPlot:
    """Live embedding view for manual collection (reference:
    pretext.py:267-290 initRealTimePlot + utils.py:24-40 drawArrows).

    Interactive mode (a display exists): plt.ion() window with the dataset
    scatter; draw_arrows() redraws the current image/sound embedding
    quivers via draw_idle + a short event loop, exactly the reference's
    protocol. Headless mode: same figure on the Agg canvas; save() writes
    the current frame to disk so the live view stays inspectable.
    """

    def __init__(self, points: dict, representation_dim: int,
                 interactive: "bool | None" = None):
        import matplotlib

        if representation_dim > 3:
            import warnings

            warnings.warn(
                "RealTimeEmbeddingPlot: representationDim "
                f"{representation_dim} > 3; the live view shows the "
                "L2-normalized first 3 components (the offline "
                "plot_representation uses t-SNE for the full view)")
        self.representation_dim = representation_dim

        self.interactive = (display_available() if interactive is None
                            else interactive)
        if not self.interactive:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self._plt = plt
        if self.interactive:  # pragma: no cover - needs a display
            # DISPLAY can be set but dead (stale X forwarding, headless
            # container): probe with a real window before committing,
            # falling back to the Agg save path instead of crashing
            try:
                plt.ion()
                probe = plt.figure()
                plt.close(probe)
                # a successful probe on a NON-interactive backend (e.g.
                # MPLBACKEND=Agg with a stale DISPLAY) is still headless:
                # report it as such so callers take the frame-dump path
                if "agg" in matplotlib.get_backend().lower():
                    self.interactive = False
            except Exception:
                self.interactive = False
                matplotlib.use("Agg", force=True)
                import matplotlib.pyplot as plt  # rebind on the new backend

                self._plt = plt
        self.fig = plt.figure(figsize=(6, 6))
        self.ax = self.fig.add_subplot(projection="3d")
        u, v = np.mgrid[0 : 2 * np.pi : 24j, 0 : np.pi : 12j]
        self.ax.plot_wireframe(
            np.cos(u) * np.sin(v), np.sin(u) * np.sin(v), np.cos(v),
            color="lightgray", linewidth=0.3)
        if points:
            img, sound = points["img"], points["sound"]
            self.ax.scatter(img[:, 0], img[:, 1], img[:, 2], c=img[:, -1],
                            marker="o", cmap="tab10", alpha=0.5)
            self.ax.scatter(sound[:, 0], sound[:, 1], sound[:, 2],
                            c=sound[:, -1], marker="^", cmap="tab10",
                            alpha=0.5)
        # status text slot (reference: fig.text at y=0.12)
        self.fig_text = self.fig.text(
            x=0.5, y=0.12, s="", fontsize=14, ha="center", color="blue")
        self.quiver_img = None
        self.quiver_sound = None
        self._flush()

    def _flush(self):
        if self.interactive:  # pragma: no cover - needs a display
            self.fig.canvas.draw_idle()
            self.fig.canvas.start_event_loop(0.001)

    def draw_arrows(self, v_img=None, v_sound=None, text: str = ""):
        """Replace the current embedding quivers (reference drawArrows:
        remove previous, draw row 0 of each batch from the origin)."""
        if self.quiver_img is not None:
            self.quiver_img.remove()
            self.quiver_img = None
        if v_img is not None:
            v = _first3(np.asarray(v_img)[0])
            self.quiver_img = self.ax.quiver(
                0.0, 0.0, 0.0, v[0], v[1], v[2], color="m", alpha=0.6, lw=3)
        if self.quiver_sound is not None:
            self.quiver_sound.remove()
            self.quiver_sound = None
        if v_sound is not None:
            v = _first3(np.asarray(v_sound)[0])
            self.quiver_sound = self.ax.quiver(
                0.0, 0.0, 0.0, v[0], v[1], v[2], color="c", alpha=1.0, lw=3)
        if text:
            self.fig_text.set_text(text)
        self._flush()

    def save(self, out_path: str) -> str:
        self.fig.savefig(out_path, dpi=100, bbox_inches="tight")
        return out_path

    def close(self):
        self._plt.close(self.fig)
