"""Host-side video IO and logging helpers.

Equivalent of the reference's cv2/PIL video+gif utilities
(`trainers.py:119-199`). This environment ships PIL only, so GIF is the
native interchange format; mp4 paths raise with a clear message (cv2 /
imageio-ffmpeg are not installed here).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def load_video(path: str | Path, image_size: tuple[int, int] | None = None) -> np.ndarray:
    """-> (c, t, h, w) float32 in [0, 1]."""
    from PIL import Image, ImageSequence

    path = Path(path)
    if path.suffix.lower() in ('.mp4', '.avi', '.mov', '.webm'):
        raise RuntimeError(
            f'{path.suffix} decoding needs cv2/imageio-ffmpeg, which are not '
            'available in this environment; convert to .gif or .npy')

    if path.suffix.lower() == '.npy':
        arr = np.load(path)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        return arr.astype(np.float32)

    img = Image.open(path)
    frames = []
    for frame in ImageSequence.Iterator(img):
        frame = frame.convert('RGB')
        if image_size is not None:
            frame = frame.resize((image_size[1], image_size[0]))
        frames.append(np.asarray(frame, np.float32) / 255.0)
    video = np.stack(frames)                   # (t, h, w, c)
    return np.transpose(video, (3, 0, 1, 2))   # (c, t, h, w)


def save_gif(path: str | Path, video: np.ndarray, fps: int = 8):
    """video: (c, t, h, w) float in [0,1] -> animated gif."""
    from PIL import Image

    video = np.clip(np.transpose(video, (1, 2, 3, 0)), 0, 1)  # (t, h, w, c)
    frames = [(f * 255).astype(np.uint8) for f in video]
    if frames[0].shape[-1] == 1:
        frames = [np.repeat(f, 3, axis=-1) for f in frames]
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)


def video_grid(videos: np.ndarray, columns: int | None = None) -> np.ndarray:
    """(b, c, t, h, w) -> (c, t, H, W) grid for logging gifs."""
    b, c, t, h, w = videos.shape
    columns = columns if columns is not None else int(np.ceil(np.sqrt(b)))
    rows = int(np.ceil(b / columns))
    grid = np.zeros((c, t, rows * h, columns * w), videos.dtype)
    for i in range(b):
        r, col = divmod(i, columns)
        grid[:, :, r * h:(r + 1) * h, col * w:(col + 1) * w] = videos[i]
    return grid
