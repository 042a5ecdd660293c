"""Offline ResNet phi extraction for dataset building.

Behavioral target: FeatureExtractor
(/root/reference/src/datasets/resnet_extractor.py:13-98): batches of 64
crops, zero-padded tail, through the frozen ResNet-50v2 -> (N, 2048)
features stored in the records (precomputed-phi training mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class FeatureExtractor:
    def __init__(self, variables, batch_size: int = 64):
        """variables: flax vars containing a 'resnet_v2_50' subtree (a
        converted reference checkpoint or HmmrModel(include_resnet) init)."""
        from human_dynamics_tpu.models.resnet import ResNetV2_50

        self.model = ResNetV2_50()
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if "resnet_v2_50" in params:
            params = params["resnet_v2_50"]
            batch_stats = batch_stats.get("resnet_v2_50", batch_stats)
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.batch_size = batch_size

    @functools.partial(jax.jit, static_argnums=0)
    def _forward(self, images: jax.Array) -> jax.Array:
        return self.model.apply(self.variables, images, train=False)

    def compute_all_phis(self, images: np.ndarray) -> np.ndarray:
        """(N, 224, 224, 3) images in [-1, 1] -> (N, 2048) features
        (resnet_extractor.py:74-98)."""
        images = np.asarray(images, np.float32)
        n = len(images)
        bs = self.batch_size
        num_batches = int(np.ceil(n / bs))
        padded = np.zeros((num_batches * bs,) + images.shape[1:], np.float32)
        padded[:n] = images
        phis = []
        for i in range(num_batches):
            phis.append(np.asarray(
                self._forward(jnp.asarray(padded[i * bs:(i + 1) * bs]))
            ))
        return np.concatenate(phis)[:n]
