"""Video / GIF writers (reference: bz_utils/video_maker.py, gif_maker.py).

Lazily-sized writers fed with numpy frames; used for per-benchmark-run
videos (run_benchmark.py:236) and debug dumps.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


class VideoWriter:
    """cv2-based writer, lazily sized from the first frame, 20 fps default
    (video_maker.py:11-51)."""

    def __init__(self, path, fps: int = 20):
        self.path = str(path)
        self.fps = fps
        self._writer = None

    def add(self, frame):
        import cv2
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            frame = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
        if self._writer is None:
            Path(self.path).parent.mkdir(parents=True, exist_ok=True)
            h, w = frame.shape[:2]
            self._writer = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*'XVID'), self.fps,
                (w, h))
        self._writer.write(frame[..., ::-1])   # RGB -> BGR

    def close(self):
        if self._writer is not None:
            self._writer.release()
            self._writer = None


def save_gif(path, frames, fps: int = 10):
    import imageio
    frames = [np.asarray(f) for f in frames]
    frames = [(np.clip(f, 0, 1) * 255).astype(np.uint8)
              if f.dtype != np.uint8 else f for f in frames]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    imageio.mimsave(str(path), frames, duration=1000.0 / fps)


def save_video(path, frames, fps: int = 20):
    w = VideoWriter(path, fps)
    for f in frames:
        w.add(f)
    w.close()


class GifMaker:
    """Keyed debug-GIF accumulator (reference: bz_utils/gif_maker.py).

    Frames accumulate per key across arbitrary call sites; `save`
    encodes and drops the key. Instantiate for scoped use, or use the
    module-level `gif` instance to match the reference's global API.
    """

    def __init__(self, default_dir='debug'):
        self.default_dir = default_dir
        self._frames = {}

    def add(self, key, frame):
        frame = np.asarray(frame)
        self._frames.setdefault(key, []).append(frame.copy())

    def save(self, key, save_dir=None, save_path=None, fps: int = 10):
        out = Path(save_dir or self.default_dir) / (save_path
                                                    or f'{key}.gif')
        save_gif(out, self._frames[key], fps=fps)
        self.clear(key)
        return out

    def clear(self, key=None):
        if key is None:
            self._frames.clear()
        else:
            self._frames.pop(key, None)

    def __len__(self):
        return len(self._frames)


gif = GifMaker()
