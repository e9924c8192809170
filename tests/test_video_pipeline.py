"""Video pipeline: IOU tracker association + end-to-end over a tiny mp4."""

import pytest
import numpy as np
import cv2

from image_restoration_tpu.serve.video import IOUTracker, VideoPipeline
from image_restoration_tpu.detect.engine import PlateDetector

pytestmark = pytest.mark.slow  # minutes-long: compile-heavy train steps


def test_iou_tracker_association():
    tr = IOUTracker(iou_threshold=0.3, max_misses=1)
    b1 = np.array([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.8, 0.8]])
    lm = np.zeros((2, 10))
    s = np.array([0.9, 0.8])
    t1 = tr.update(b1, lm, s)
    ids1 = {t.track_id for t in t1}
    # slight motion → same ids
    b2 = b1 + 0.02
    t2 = tr.update(b2, lm, s)
    assert {t.track_id for t in t2} == ids1
    # disappear → track dropped after max_misses
    tr.update(np.zeros((0, 4)), np.zeros((0, 10)), np.zeros(0))
    tr.update(np.zeros((0, 4)), np.zeros((0, 10)), np.zeros(0))
    assert len(tr.tracks) == 0


def test_video_pipeline_end_to_end(tmp_path, rng):
    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 5, (96, 96))
    for _ in range(6):
        w.write((rng.random((96, 96, 3)) * 255).astype(np.uint8))
    w.release()

    det = PlateDetector(backbone="Resnet18", image_size=64,
                        score_threshold=0.0, keep_top_k=3)
    pipe = VideoPipeline(detector=det, batch_size=2)
    out_path = str(tmp_path / "out.mp4")
    results = pipe.run(src, output_path=out_path, max_frames=4)
    assert len(results) == 4
    cap = cv2.VideoCapture(out_path)
    ok, frame = cap.read()
    assert ok and frame.shape == (96, 96, 3)
    cap.release()
