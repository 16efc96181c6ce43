"""Segmentation transforms (host, numpy/PIL).

Behavioral contract: reference
``dataset/segmentation/custom_transforms.py`` — the train/val transform
classes operating on ``{"image", "label"}`` sample dicts: Normalize,
RandomHorizontalFlip, RandomRotate, RandomGaussianBlur,
RandomScaleCrop (fill=254 on labels), FixScaleCrop, FixedResize.
Outputs NHWC float32 (no torch tensors).
"""

from __future__ import annotations

import random
from typing import Dict

import numpy as np

Sample = Dict[str, "object"]  # {"image": PIL.Image, "label": PIL.Image}


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, sample: Sample) -> Sample:
        for t in self.transforms:
            sample = t(sample)
        return sample


class Normalize:
    """(x/255 - mean)/std on the image; label to int array."""

    def __init__(self, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample: Sample) -> Sample:
        img = np.asarray(sample["image"], np.float32) / 255.0
        img = (img - self.mean) / self.std
        label = np.asarray(sample["label"], np.float32)
        return {"image": img, "label": label}


class RandomHorizontalFlip:
    def __call__(self, sample: Sample) -> Sample:
        from PIL import Image

        if random.random() < 0.5:
            return {
                "image": sample["image"].transpose(Image.FLIP_LEFT_RIGHT),
                "label": sample["label"].transpose(Image.FLIP_LEFT_RIGHT),
            }
        return sample


class RandomRotate:
    def __init__(self, degree: float):
        self.degree = degree

    def __call__(self, sample: Sample) -> Sample:
        from PIL import Image

        deg = random.uniform(-self.degree, self.degree)
        return {
            "image": sample["image"].rotate(deg, Image.BILINEAR),
            "label": sample["label"].rotate(deg, Image.NEAREST),
        }


class RandomGaussianBlur:
    def __call__(self, sample: Sample) -> Sample:
        from PIL import ImageFilter

        if random.random() < 0.5:
            return {
                "image": sample["image"].filter(
                    ImageFilter.GaussianBlur(radius=random.random())
                ),
                "label": sample["label"],
            }
        return sample


class RandomScaleCrop:
    """Random scale in [0.5, 2.0] x base_size, pad (label fill=254),
    random crop (reference ``custom_transforms.py`` RandomScaleCrop)."""

    def __init__(self, base_size: int, crop_size: int, fill: int = 254):
        self.base_size = base_size
        self.crop_size = crop_size
        self.fill = fill

    def __call__(self, sample: Sample) -> Sample:
        from PIL import Image, ImageOps

        img, mask = sample["image"], sample["label"]
        short_size = random.randint(
            int(self.base_size * 0.5), int(self.base_size * 2.0)
        )
        w, h = img.size
        if h > w:
            ow = short_size
            oh = int(1.0 * h * ow / w)
        else:
            oh = short_size
            ow = int(1.0 * w * oh / h)
        img = img.resize((ow, oh), Image.BILINEAR)
        mask = mask.resize((ow, oh), Image.NEAREST)
        if short_size < self.crop_size:
            padh = max(self.crop_size - oh, 0)
            padw = max(self.crop_size - ow, 0)
            img = ImageOps.expand(img, border=(0, 0, padw, padh), fill=0)
            mask = ImageOps.expand(mask, border=(0, 0, padw, padh), fill=self.fill)
        w, h = img.size
        x1 = random.randint(0, w - self.crop_size)
        y1 = random.randint(0, h - self.crop_size)
        box = (x1, y1, x1 + self.crop_size, y1 + self.crop_size)
        return {"image": img.crop(box), "label": mask.crop(box)}


class FixScaleCrop:
    """Scale short side then center crop (the val transform)."""

    def __init__(self, crop_size: int):
        self.crop_size = crop_size

    def __call__(self, sample: Sample) -> Sample:
        from dfq_tpu.data.voc import fix_scale_crop

        img, mask = fix_scale_crop(sample["image"], sample["label"], self.crop_size)
        return {"image": img, "label": mask}


class FixedResize:
    def __init__(self, size: int):
        self.size = (size, size)

    def __call__(self, sample: Sample) -> Sample:
        from PIL import Image

        return {
            "image": sample["image"].resize(self.size, Image.BILINEAR),
            "label": sample["label"].resize(self.size, Image.NEAREST),
        }
