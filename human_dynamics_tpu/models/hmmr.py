"""The full HMMR model: phi -> movie strip -> IEF omegas (+dt heads, +hal).

One flax module replaces the reference's graph assembled across
Tester.build_test_model (/root/reference/src/evaluation/tester.py:169-215)
and HMRSequenceTrainer.build_model
(/root/reference/src/trainer_sequence_fc.py:551-665): everything is a
single pure function of (params, inputs) that jits into one XLA program.

Weight sharing contract (critical for checkpoint parity):
- The present-frame IEF regressor ('single_view_ief') is shared between
  the temporal-encoder branch and the hallucinator branch
  (trainer_sequence_fc.py:592-607 passes the same scope).
- Each delta head has its own regressor named single_view_ief_past{k} /
  single_view_ief_future{k} (models.py:344-347), also shared across
  branches.
- mean_param (1, 85) is a trainable variable (tester.py:136-141).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from human_dynamics_tpu.models.hallucinator import Hallucinator
from human_dynamics_tpu.models.ief import IefRegressor, ief_refine
from human_dynamics_tpu.models.resnet import ResNetV2_50
from human_dynamics_tpu.models.temporal import TemporalEncoderFC2GN
from human_dynamics_tpu.models.omega import OMEGA_DIM


def default_mean_omega() -> np.ndarray:
    """Fallback mean Omega when the neutral_smpl mean file is absent.

    The real initialization loads neutral_smpl_meanwjoints.h5 and sets
    cam=[0.9,0,0], pose[:3]=0, pose[0]=pi (tester.py:118-133). Without the
    asset we keep exactly those enforced entries and zeros elsewhere.
    """
    mean = np.zeros((1, OMEGA_DIM), np.float32)
    mean[0, 0] = 0.9          # cam scale
    mean[0, 3] = np.pi        # global rotation: upright
    return mean


def _h5_dataset(group, name):
    """Fetch a dataset from an h5 file, tolerating the deepdish layout
    (datasets at the root, or under a '/data' group)."""
    if name in group:
        return np.asarray(group[name])
    if "data" in group and name in group["data"]:
        return np.asarray(group["data"][name])
    raise KeyError(
        f"mean-omega file is missing dataset '{name}' "
        f"(available: {list(group.keys())})"
    )


def load_mean_omega(path: str) -> np.ndarray:
    """Mean Omega (1, 85) from ``neutral_smpl_meanwjoints.h5`` (or an npz
    conversion with the same 'pose'/'shape' keys).

    Applies the reference's overrides exactly (tester.py:118-141 /
    trainer_sequence_fc.py:447-479): cam=[0.9, 0, 0]; global rotation
    zeroed then pose[0]=pi so the mean projects upright.
    """
    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, "r") as f:
            pose = _h5_dataset(f, "pose").reshape(72).astype(np.float64)
            shape = _h5_dataset(f, "shape").reshape(10).astype(np.float64)
    else:
        data = np.load(path)
        pose = np.asarray(data["pose"]).reshape(72).astype(np.float64)
        shape = np.asarray(data["shape"]).reshape(10).astype(np.float64)

    cams = np.array([0.9, 0.0, 0.0])
    pose[:3] = 0.0
    pose[0] = np.pi
    return np.hstack((cams, pose, shape))[None].astype(np.float32)


def resolve_mean_omega(path: Optional[str]) -> np.ndarray:
    """load_mean_omega when `path` exists, else the zeros fallback."""
    import os

    if path and os.path.exists(path):
        return load_mean_omega(path)
    return default_mean_omega()


class HmmrOutputs(NamedTuple):
    """All prediction heads for one (B, T) window.

    omega_pred: (B, T, 85) present prediction (own camera).
    omegas_delta: {dt: (B, T, 85)} +-dt predictions, camera = [1, 0, 0].
    omega_hal: (B, T, 85) hallucinator present prediction, or None.
    omegas_hal_delta: {dt: (B, T, 85)} hallucinator dt heads (train-only
        option do_hallucinate_preds), possibly empty.
    movie_strip: (B, T, 2048) temporal-encoder features.
    hal_strip: (B, T, 2048) hallucinated movie strip, or None.
    phi: (B, T, 2048) per-frame image features.
    """

    omega_pred: jax.Array
    omegas_delta: Dict[int, jax.Array]
    omega_hal: Optional[jax.Array]
    omegas_hal_delta: Dict[int, jax.Array]
    movie_strip: jax.Array
    hal_strip: Optional[jax.Array]
    phi: jax.Array


class HmmrModel(nn.Module):
    """phi/images (B, T, ...) -> HmmrOutputs."""

    num_conv_layers: int = 3
    delta_t_values: Sequence[int] = (-5, 5)
    predict_delta: bool = True
    do_hallucinate: bool = True
    do_hallucinate_preds: bool = False
    use_hmr_only: bool = False
    num_stage: int = 3
    use_delta_from_pred: bool = True
    include_resnet: bool = False   # False = precomputed-phi mode (default)
    remat_resnet: bool = False     # remat bottleneck units (training perf)
    # Fine-tune with frozen BatchNorm statistics (inference-mode BN while
    # still differentiating the conv weights) — the standard recipe when
    # starting from a pretrained trunk, and it removes the batch-stat
    # reductions from the backward pass.
    freeze_bn_stats: bool = False
    feature_dim: int = 2048
    # Initial value of the trainable mean_param; None -> zeros fallback.
    # Wire Config.smpl_mean_path through resolve_mean_omega to set this
    # (reference: load_mean_omega, trainer_sequence_fc.py:447-479).
    mean_omega_init: Optional[np.ndarray] = None

    @property
    def fov(self) -> int:
        """Temporal receptive field (trainer_sequence_fc.py:84)."""
        return 4 * self.num_conv_layers + 1

    def setup(self):
        if self.include_resnet:
            self.resnet_v2_50 = ResNetV2_50(remat=self.remat_resnet)
        self.temporal_encoder = TemporalEncoderFC2GN(
            num_layers=self.num_conv_layers, num_filter=self.feature_dim
        )
        if self.do_hallucinate:
            self.hallucinator = Hallucinator(features=self.feature_dim)
        self.single_view_ief = IefRegressor(num_output=OMEGA_DIM)
        deltas = {}
        for dt in self.delta_t_values:
            if dt == 0:
                continue
            key = f"past{abs(dt)}" if dt < 0 else f"future{dt}"
            deltas[key] = IefRegressor(num_output=72)
        self.ief_delta = deltas
        mean_init = (
            default_mean_omega()
            if self.mean_omega_init is None
            else np.asarray(self.mean_omega_init, np.float32).reshape(
                1, OMEGA_DIM
            )
        )
        self.mean_param = self.param(
            "mean_param", lambda rng: jnp.asarray(mean_init)
        )

    def encode_images(self, images: jax.Array, train: bool = False):
        """images (B, T, H, W, 3) in [-1, 1] -> phi (B, T, 2048)."""
        b, t = images.shape[:2]
        flat = images.reshape((b * t,) + images.shape[2:])
        phi = self.resnet_v2_50(
            flat, train=train and not self.freeze_bn_stats
        )
        return phi.reshape(b, t, -1)

    def _pred_heads(
        self, features: jax.Array, train: bool, with_deltas: bool
    ) -> Tuple[jax.Array, Dict[int, jax.Array]]:
        """IEF on (B, T, D) features; returns present + delta omegas.

        Mirrors batch_pred_omega + call_hmr_ief
        (/root/reference/src/models.py:233-267,299-377) with
        use_optcam=True: delta heads regress 72-D pose only, then get the
        fixed camera [1, 0, 0] and the start-omega's beta re-attached.
        """
        b, t, d = features.shape
        phi = features.reshape(b * t, d)
        omega_mean = jnp.broadcast_to(self.mean_param, (b * t, OMEGA_DIM))

        present = ief_refine(
            self.single_view_ief, phi, omega_mean,
            num_stage=self.num_stage, train=train,
        )

        deltas: Dict[int, jax.Array] = {}
        if with_deltas:
            start_full = present if self.use_delta_from_pred else omega_mean
            beta = start_full[:, -10:]
            start72 = start_full[:, 3:75]
            n = start72.shape[0]
            cam_fixed = jnp.concatenate(
                [jnp.ones((n, 1)), jnp.zeros((n, 2))], axis=1
            ).astype(features.dtype)
            for dt in self.delta_t_values:
                if dt == 0:
                    continue
                key = f"past{abs(dt)}" if dt < 0 else f"future{dt}"
                pose72 = ief_refine(
                    self.ief_delta[key], phi, start72,
                    num_stage=self.num_stage, train=train,
                )
                deltas[dt] = jnp.concatenate(
                    [cam_fixed, pose72, beta], axis=1
                ).reshape(b, t, OMEGA_DIM)

        return present.reshape(b, t, OMEGA_DIM), deltas

    def __call__(
        self,
        inputs: jax.Array,
        train: bool = False,
    ) -> HmmrOutputs:
        """inputs: phi (B, T, 2048) or images (B, T, H, W, 3)."""
        if inputs.ndim == 5:
            if not self.include_resnet:
                raise ValueError(
                    "Model built without resnet but got image input"
                )
            phi = self.encode_images(inputs, train=train)
        else:
            phi = inputs

        with_deltas = self.predict_delta

        if self.use_hmr_only:
            movie_strip = phi
        else:
            movie_strip = self.temporal_encoder(phi)

        omega_pred, omegas_delta = self._pred_heads(
            movie_strip, train, with_deltas
        )

        omega_hal = None
        omegas_hal_delta: Dict[int, jax.Array] = {}
        hal_strip = None
        if self.do_hallucinate:
            hal_strip = self.hallucinator(phi)
            omega_hal, omegas_hal_delta = self._pred_heads(
                hal_strip, train, with_deltas and self.do_hallucinate_preds
            )

        return HmmrOutputs(
            omega_pred=omega_pred,
            omegas_delta=omegas_delta,
            omega_hal=omega_hal,
            omegas_hal_delta=omegas_hal_delta,
            movie_strip=movie_strip,
            hal_strip=hal_strip,
            phi=phi,
        )
