"""Metric aggregation + scalar logging.

DictAverageMeter mirrors the reference epoch aggregation
(MVSNet/utils.py:107-126); ScalarLogger writes JSONL always and TensorBoard
when torch's SummaryWriter is importable (the reference used tensorboardX)."""

from __future__ import annotations

import json
import time
from pathlib import Path

__all__ = ["DictAverageMeter", "ScalarLogger"]


class DictAverageMeter:
    def __init__(self):
        self.sums: dict[str, float] = {}
        self.count = 0

    def update(self, values: dict, n: int = 1):
        for k, v in values.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v) * n
        self.count += n

    def mean(self) -> dict:
        return {k: v / max(self.count, 1) for k, v in self.sums.items()}

    def reset(self):
        self.sums, self.count = {}, 0


class ScalarLogger:
    def __init__(self, log_dir, use_tensorboard: bool = True):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "scalars.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.dir))
            except Exception:
                self._tb = None

    def log(self, step: int, values: dict, prefix: str = ""):
        rec = {"step": step, "time": time.time()}
        for k, v in values.items():
            key = f"{prefix}{k}"
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_image(self, step: int, tag: str, image, save_png: bool = True):
        """Log an (H, W, 3) uint8 image: TensorBoard when available, plus a
        PNG under <log_dir>/images/ so image summaries survive without TB
        (the reference's save_images slot, MVSNet/utils.py:74-104)."""
        import numpy as np

        image = np.asarray(image)
        if self._tb is not None:
            self._tb.add_image(tag, image, step, dataformats="HWC")
        if save_png:
            try:
                from PIL import Image

                out = self.dir / "images"
                out.mkdir(exist_ok=True)
                safe = tag.replace("/", "_")
                Image.fromarray(image).save(out / f"{safe}_{step:08d}.png")
            except Exception:
                pass

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
