"""Face/plate restoration helper — parity role of basicsr/utils/face_util.py
(dlib FaceRestorationHelper, :15-192).

dlib is not a dependency; the detector here is our RetinaFace plate engine
(detect/engine.py), giving the same capability surface: detect → align by
landmarks → restore → paste back. For human faces a dlib-style detector can
be plugged in via the `detector` argument.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class RestorationHelper:
    """Detect → affine-align crops → restore → inverse-paste."""

    def __init__(self, detector=None, upscale_factor: int = 1,
                 face_size: int = 256):
        if detector is None:
            from ..detect.engine import PlateDetector
            detector = PlateDetector()
        self.detector = detector
        self.upscale_factor = upscale_factor
        self.face_size = face_size
        self.template = np.asarray(
            [[0.15, 0.25], [0.85, 0.25], [0.5, 0.5], [0.15, 0.75],
             [0.85, 0.75]], np.float32) * face_size
        self.reset()

    def reset(self):
        self.landmarks = []
        self.affine_matrices = []
        self.cropped_faces = []
        self.restored_faces = []
        self.input_img = None

    def detect_landmarks(self, img_bgr: np.ndarray, top_k: int = 5):
        """Populate self.landmarks from the detector (5 points each)."""
        self.input_img = img_bgr
        boxes, scores, landms, valid = self.detector.detect_image(img_bgr)
        for i in range(len(scores)):
            if valid[i]:
                self.landmarks.append(landms[i].reshape(5, 2))
        return len(self.landmarks)

    def warp_crop_faces(self):
        """Affine-align each detected region to the template crop."""
        for lm in self.landmarks:
            m, _ = cv2.estimateAffinePartial2D(lm.astype(np.float32),
                                               self.template,
                                               method=cv2.LMEDS)
            crop = cv2.warpAffine(self.input_img, m,
                                  (self.face_size, self.face_size))
            self.affine_matrices.append(m)
            self.cropped_faces.append(crop)
        return self.cropped_faces

    def add_restored_face(self, face_bgr: np.ndarray):
        self.restored_faces.append(face_bgr)

    def paste_faces_to_input_image(self) -> np.ndarray:
        """Inverse-affine paste with feathered masks (ref :120-180 role)."""
        h, w = self.input_img.shape[:2]
        up = self.upscale_factor
        out = cv2.resize(self.input_img, (w * up, h * up))
        for face, m in zip(self.restored_faces, self.affine_matrices):
            scaled = m * up
            inv = cv2.invertAffineTransform(scaled)
            warped = cv2.warpAffine(face, inv, (w * up, h * up))
            mask = np.ones(face.shape[:2], np.float32)
            mask = cv2.warpAffine(mask, inv, (w * up, h * up))
            mask = cv2.erode(mask, np.ones((3, 3), np.uint8))
            mask = cv2.GaussianBlur(mask, (11, 11), 0)[..., None]
            out = (warped * mask + out * (1 - mask)).astype(np.uint8)
        return out
