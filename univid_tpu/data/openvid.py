"""OpenVid-5M training dataset.

Behavioral parity with reference OpenVidDataset
(model_pipeline.py:1904-2108): scan a video directory, join the OpenVid
CSV captions on the 'video' column, filter by quality (aesthetic >= 4.5,
motion >= 3.0, temporal consistency >= 0.8, duration >= 3 s, caption
length > 10), fall back to file-derived records when the CSV is absent,
and load `video_length` frames resized to `video_size` normalized to
[-1, 1]. Channels-last [T, H, W, 3] float32 (the TPU layout) instead of
torch's [T, 3, H, W]."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

VIDEO_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".flv")


@dataclass
class OpenVidConfig:
    video_base_path: str = "data/openvid/videos"
    csv_file: str = "data/openvid/OpenVid-1M.csv"
    video_size: Tuple[int, int] = (512, 320)   # (W, H)
    video_length: int = 21
    max_samples: int = 1000
    min_aesthetic_score: float = 4.5
    min_motion_score: float = 3.0
    min_temporal_consistency: float = 0.8
    min_duration: float = 3.0


class OpenVidDataset:
    """Map-style dataset; __getitem__ -> {'video': [T, H, W, 3] float32
    in [-1, 1], 'caption': str, 'quality_scores': dict}."""

    def __init__(self, cfg: OpenVidConfig):
        self.cfg = cfg
        self.video_files = self._scan_videos()
        self.records = self._load_and_filter()

    # ------------------------------------------------------------------
    def _scan_videos(self) -> List[str]:
        if not os.path.isdir(self.cfg.video_base_path):
            return []
        files = [f for f in sorted(os.listdir(self.cfg.video_base_path))
                 if f.lower().endswith(VIDEO_EXTENSIONS)]
        return files[: self.cfg.max_samples]

    def _load_and_filter(self) -> List[Dict]:
        if not self.video_files:
            return []
        if not os.path.exists(self.cfg.csv_file):
            return self._records_from_files()
        try:
            import pandas as pd
            df = pd.read_csv(self.cfg.csv_file)
        except Exception:  # noqa: BLE001
            return self._records_from_files()
        if "video" not in df.columns:
            return self._records_from_files()
        df = df[df["video"].isin(set(self.video_files))].copy()
        if len(df) == 0:
            return self._records_from_files()

        c = self.cfg
        if "aesthetic score" in df.columns:
            df = df[df["aesthetic score"] >= c.min_aesthetic_score]
        if "motion score" in df.columns:
            df = df[df["motion score"] >= c.min_motion_score]
        if "temporal consistency score" in df.columns:
            df = df[df["temporal consistency score"]
                    >= c.min_temporal_consistency]
        if "seconds" in df.columns:
            df = df[df["seconds"] >= c.min_duration]
        df = df.dropna(subset=["video"])
        if "caption" in df.columns:
            df = df.dropna(subset=["caption"])
            df = df[df["caption"].str.len() > 10]
        df = df.head(len(self.video_files)).reset_index(drop=True)
        return df.to_dict("records")

    def _records_from_files(self) -> List[Dict]:
        # reference fallback (model_pipeline.py:1996-2012)
        return [{
            "video": f,
            "caption": f"High quality video content: "
                       f"{os.path.splitext(f)[0]}",
            "aesthetic score": 5.0, "motion score": 4.0,
            "temporal consistency score": 0.9, "seconds": 5.0,
        } for f in self.video_files]

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Dict:
        row = self.records[idx]
        w, h = self.cfg.video_size
        t = self.cfg.video_length
        path = os.path.join(self.cfg.video_base_path, row["video"])
        video = self._load_video(path) if os.path.exists(path) else \
            np.zeros((t, h, w, 3), np.float32)
        return {
            "video": video,
            "caption": str(row["caption"]),
            "quality_scores": {
                "aesthetic": row.get("aesthetic score", 5.0),
                "motion": row.get("motion score", 4.0),
                "temporal": row.get("temporal consistency score", 0.9),
            },
        }

    def _load_video(self, path: str) -> np.ndarray:
        from .video_io import read_video_frames

        w, h = self.cfg.video_size
        t = self.cfg.video_length
        try:
            frames = read_video_frames(path, num_frames=t)
        except Exception:  # noqa: BLE001
            return np.zeros((t, h, w, 3), np.float32)
        out = []
        for f in frames[:t]:
            f = np.asarray(f, np.float32) / 255.0
            if f.shape[:2] != (h, w):
                f = _resize_bilinear(f, h, w)
            out.append(f)
        # pad by repeating the last frame (model_pipeline.py:2092-2097)
        while len(out) < t:
            out.append(out[-1] if out else np.zeros((h, w, 3), np.float32))
        return (np.stack(out) - 0.5) * 2.0

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Host-side bilinear resize (align_corners=False sampling)."""
    sh, sw = img.shape[:2]
    ys = np.clip((np.arange(h) + 0.5) * sh / h - 0.5, 0, sh - 1)
    xs = np.clip((np.arange(w) + 0.5) * sw / w - 0.5, 0, sw - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)
