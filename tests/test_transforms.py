"""Train-time transform stacks (seg + det)."""

import numpy as np
import pytest


def test_seg_transforms_pipeline():
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from dfq_tpu.data.seg_transforms import (
        Compose,
        FixScaleCrop,
        Normalize,
        RandomGaussianBlur,
        RandomHorizontalFlip,
        RandomRotate,
        RandomScaleCrop,
    )

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8))
    mask = Image.fromarray(rng.integers(0, 21, (120, 160), np.uint8))

    train = Compose(
        [
            RandomHorizontalFlip(),
            RandomScaleCrop(base_size=100, crop_size=97),
            RandomRotate(15),
            RandomGaussianBlur(),
            Normalize(),
        ]
    )
    out = train({"image": img, "label": mask})
    assert out["image"].shape == (97, 97, 3)
    assert out["label"].shape == (97, 97)
    assert out["image"].dtype == np.float32

    val = Compose([FixScaleCrop(crop_size=97), Normalize()])
    out = val({"image": img, "label": mask})
    assert out["image"].shape == (97, 97, 3)


def test_det_train_augmentation():
    from dfq_tpu.detection.transforms import (
        PredictionTransform,
        TestTransform,
        TrainAugmentation,
    )

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (240, 320, 3)).astype(np.float32)
    boxes = np.array([[20, 30, 200, 180], [50, 60, 120, 140]], np.float32)
    labels = np.array([3, 7])

    aug = TrainAugmentation(size=300)
    for _ in range(5):  # randomized paths
        out_img, out_boxes, out_labels = aug(img, boxes, labels)
        assert out_img.shape == (300, 300, 3)
        assert out_boxes.shape[1] == 4
        assert len(out_labels) == out_boxes.shape[0] >= 1
        # percent coords
        assert out_boxes.min() >= -1e-3 and out_boxes.max() <= 1.5

    t_img, t_boxes, t_labels = TestTransform(300)(img, boxes, labels)
    assert t_img.shape == (300, 300, 3)
    assert np.abs(t_img).max() <= 2.0  # normalized by 128

    p_img = PredictionTransform(300)(img)
    assert p_img.shape == (300, 300, 3)
