"""BEiT-style block image masking (reference
src/data/components/unimed.py:22-99 ImageMaskingGenerator — duplicated in
three reference files, unused in the MedMoE train path but part of the
component surface; feeds MIM-style objectives like ops/flava.py's
MaskedPredictionLoss)."""

from __future__ import annotations

import math
import random
from typing import Optional, Tuple

import numpy as np


class ImageMaskingGenerator:
    """Samples rectangular blocks until ``num_masking_patches`` of the
    ``input_size`` patch grid are masked."""

    def __init__(self, input_size, num_masking_patches: int,
                 min_num_patches: int = 4,
                 max_num_patches: Optional[int] = None,
                 min_aspect: float = 0.3, max_aspect: Optional[float] = None,
                 seed: Optional[int] = None):
        if not isinstance(input_size, tuple):
            input_size = (input_size, input_size)
        self.height, self.width = input_size
        self.num_patches = self.height * self.width
        self.num_masking_patches = num_masking_patches
        self.min_num_patches = min_num_patches
        self.max_num_patches = (num_masking_patches
                                if max_num_patches is None
                                else max_num_patches)
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))
        self.rng = random.Random(seed)

    def __repr__(self) -> str:
        return (f"MaskingGenerator({self.height}, {self.width} -> "
                f"[{self.min_num_patches} ~ {self.max_num_patches}], "
                f"max = {self.num_masking_patches})")

    def get_shape(self) -> Tuple[int, int]:
        return self.height, self.width

    def _mask_block(self, mask: np.ndarray, max_mask_patches: int) -> int:
        delta = 0
        for _ in range(10):
            target_area = self.rng.uniform(self.min_num_patches,
                                           max_mask_patches)
            aspect_ratio = math.exp(self.rng.uniform(*self.log_aspect_ratio))
            h = int(round(math.sqrt(target_area * aspect_ratio)))
            w = int(round(math.sqrt(target_area / aspect_ratio)))
            if w < self.width and h < self.height:
                top = self.rng.randint(0, self.height - h)
                left = self.rng.randint(0, self.width - w)
                num_masked = mask[top:top + h, left:left + w].sum()
                if 0 < h * w - num_masked <= max_mask_patches:
                    for i in range(top, top + h):
                        for j in range(left, left + w):
                            if mask[i, j] == 0:
                                mask[i, j] = 1
                                delta += 1
                if delta > 0:
                    break
        return delta

    def __call__(self) -> np.ndarray:
        mask = np.zeros(shape=self.get_shape(), dtype=np.int64)
        mask_count = 0
        while mask_count < self.num_masking_patches:
            max_mask_patches = min(self.num_masking_patches - mask_count,
                                   self.max_num_patches)
            delta = self._mask_block(mask, max_mask_patches)
            if delta == 0:
                break
            mask_count += delta
        return mask
