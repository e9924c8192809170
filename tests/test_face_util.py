"""RestorationHelper (utils/face_util.py — the dlib FaceRestorationHelper
parity surface): detect → affine-align → restore → inverse paste-back."""

import numpy as np

from image_restoration_tpu.utils.face_util import RestorationHelper


class FakeDetector:
    """Deterministic stand-in for the RetinaFace engine: one detection with
    5 landmark points forming an axis-aligned region."""

    def __init__(self, box):
        self.box = box  # (x1, y1, x2, y2)

    def detect_image(self, img):
        x1, y1, x2, y2 = self.box
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        landms = np.asarray([[x1, y1], [x2, y1], [cx, cy], [x1, y2],
                             [x2, y2]], np.float32).reshape(1, 10)
        boxes = np.asarray([[x1, y1, x2, y2]], np.float32)
        return boxes, np.asarray([0.99]), landms, np.asarray([True])


def test_restoration_helper_roundtrip():
    rng = np.random.default_rng(0)
    img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    box = (32, 24, 96, 72)
    helper = RestorationHelper(detector=FakeDetector(box), face_size=64)

    n = helper.detect_landmarks(img)
    assert n == 1 and helper.landmarks[0].shape == (5, 2)

    crops = helper.warp_crop_faces()
    assert len(crops) == 1 and crops[0].shape == (64, 64, 3)
    # geometric check: the estimated affine must map the source region
    # center onto the crop center (the landmark centroid → template
    # centroid under any similarity fit)
    m = helper.affine_matrices[0]
    center = m @ np.asarray([(32 + 96) / 2, (24 + 72) / 2, 1.0])
    np.testing.assert_allclose(center, [32, 32], atol=1.5)

    # identity restore → paste-back keeps shape and stays a blend of the
    # warped crop and the input (no out-of-range artifacts)
    helper.add_restored_face(crops[0])
    out = helper.paste_faces_to_input_image()
    assert out.shape == img.shape
    assert out.dtype == np.uint8


def test_restoration_helper_upscale():
    rng = np.random.default_rng(1)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    helper = RestorationHelper(detector=FakeDetector((8, 8, 56, 56)),
                               upscale_factor=2, face_size=32)
    helper.detect_landmarks(img)
    crops = helper.warp_crop_faces()
    helper.add_restored_face(crops[0])
    out = helper.paste_faces_to_input_image()
    assert out.shape == (128, 128, 3)
