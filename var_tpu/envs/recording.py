"""Episode image recording (reference: fourInARow.py:101-108,
RL_env_VAR.py:460-467 saveEpisodeImage)."""
from __future__ import annotations

import os

import numpy as np


def save_episode_image(config, image_hwc: np.ndarray, episode: int,
                       step: int, tag: str = ""):
    """Dump the frame when episodeImgSaveInterval > 0 and the episode index
    matches; resized to config.episodeImgSize, BGR-converted like the
    reference's cv2.imwrite path."""
    interval = getattr(config, "episodeImgSaveInterval", -1)
    if interval <= 0 or episode % interval != 0:
        return None
    import cv2

    os.makedirs(config.episodeImgSaveDir, exist_ok=True)
    h, w, c = config.episodeImgSize
    img = cv2.resize(np.asarray(image_hwc), (w, h))
    if c == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    name = f"{tag}{episode}_{step}.jpg"
    path = os.path.join(config.episodeImgSaveDir, name)
    cv2.imwrite(path, img)
    return path
