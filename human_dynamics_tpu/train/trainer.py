"""HMMR training: one jitted two-optimizer GAN step + driver loop.

TPU-first re-design of HMRSequenceTrainer
(/root/reference/src/trainer_sequence_fc.py). The reference assembles a
TF-1 graph with two AdamOptimizer minimize ops run in the same sess.run;
here the *entire* step — all prediction heads, one stacked SMPL decode,
every loss, both optimizers — is a single pure function jitted once and
pjit-shardable over a data mesh axis.

Two-optimizer semantics (trainer_sequence_fc.py:752-768) are reproduced
with ONE forward + ONE backward:

    total = e_loss(params_e, stop_grad(params_d))
          + d_loss(stop_grad(fakes), params_d)

so grad(total) w.r.t. params_e is exactly the encoder gradient (the
discriminator is a frozen critic) and w.r.t. params_d exactly the
discriminator gradient (fakes are detached) — matching the reference's
var_list-restricted minimize calls.

Note on weight decay: the reference *registers* slim L2 regularizers
(e_wd/d_wd) but never adds REGULARIZATION_LOSSES to its objective, so
they are inert; we faithfully default to no weight decay.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from human_dynamics_tpu.core.smpl import SmplModel
from human_dynamics_tpu.models.discriminator import PoseDiscriminator
from human_dynamics_tpu.models.hmmr import HmmrModel, resolve_mean_omega
from human_dynamics_tpu.models.omega import (
    OmegaGt,
    compute_smpl,
    split_omega,
)
from human_dynamics_tpu.train import losses as L
from human_dynamics_tpu.utils.config import Config
from human_dynamics_tpu.utils.precision import tree_bf16

TrainConfig = Config  # alias; the single Config drives training too.


class Batch(NamedTuple):
    """One training minibatch (the SequenceDataLoader contract,
    trainer_sequence_fc.py:55-63).

    phis: (B, T, 2048) precomputed features (or images (B,T,H,W,3)).
    kps: (B, T, K, 3) 2D keypoints with visibility.
    poses_gt: (B, T, 24, 3) gt SMPL pose (axis-angle).
    shapes_gt: (B, 10) gt SMPL shape.
    joints_gt: (B, T, 14, 3) gt 3D joints.
    has_3d_joints: (B,) float flags.
    has_3d_smpl: (B,) float flags.
    poses_real: (N_fake_pool, 24, 3, 3) mocap rotation matrices for the
        adversarial prior (the real pool; must match the fake pool size,
        data_loader_sequence.py:185-202).
    """

    phis: jax.Array
    kps: jax.Array
    poses_gt: jax.Array
    shapes_gt: jax.Array
    joints_gt: jax.Array
    has_3d_joints: jax.Array
    has_3d_smpl: jax.Array
    poses_real: jax.Array


class TrainState(NamedTuple):
    params_e: Any            # HmmrModel params (+ batch_stats if resnet)
    params_d: Any            # PoseDiscriminator params
    opt_state_e: Any
    opt_state_d: Any
    step: jax.Array


def fake_pool_size(config: Config) -> int:
    """Fakes fed to the discriminator per step: present + each delta head
    + hallucinator heads, each B*T poses (trainer_sequence_fc.py:833-836,
    929-932; data_loader_sequence.py:185-202 computes the same count for
    the real pool)."""
    bt = config.batch_size * config.T
    num_heads = 1
    if config.predict_delta:
        num_heads += len([d for d in config.delta_t_values if d != 0])
    if config.do_hallucinate:
        num_heads += 1
        if config.do_hallucinate_preds:
            num_heads += len([d for d in config.delta_t_values if d != 0])
    return bt * num_heads


def build_models(config: Config) -> Tuple[HmmrModel, PoseDiscriminator]:
    hmmr = HmmrModel(
        num_conv_layers=config.num_conv_layers,
        delta_t_values=tuple(config.delta_t_values),
        predict_delta=config.predict_delta,
        do_hallucinate=config.do_hallucinate,
        do_hallucinate_preds=config.do_hallucinate_preds,
        use_hmr_only=config.use_hmr_only,
        num_stage=config.num_stage,
        use_delta_from_pred=config.use_delta_from_pred,
        include_resnet=not config.precomputed_phi,
        remat_resnet=config.remat_resnet,
        freeze_bn_stats=config.freeze_bn_stats,
        feature_dim=config.feature_dim,
        mean_omega_init=resolve_mean_omega(config.smpl_mean_path),
    )
    disc = PoseDiscriminator()
    return hmmr, disc


def create_train_state(
    config: Config, rng: jax.Array, sample_input: Optional[jax.Array] = None
) -> Tuple[TrainState, HmmrModel, PoseDiscriminator]:
    hmmr, disc = build_models(config)
    if sample_input is None:
        if config.precomputed_phi:
            sample_input = jnp.zeros((1, config.T, config.feature_dim))
        else:
            # Image-mode: init must build the resnet params too.
            sample_input = jnp.zeros(
                (1, 1, config.img_size, config.img_size, 3)
            )
    rng_e, rng_d = jax.random.split(rng)
    params_e = hmmr.init(rng_e, sample_input)
    params_d = disc.init(rng_d, jnp.zeros((2, 23, 9)))

    tx_e, tx_d = make_optimizers(config)
    trainable_e, _ = split_frozen_params(config, params_e["params"])
    state = TrainState(
        params_e=params_e,
        params_d=params_d,
        opt_state_e=tx_e.init(trainable_e),
        opt_state_d=tx_d.init(params_d["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, hmmr, disc


def split_frozen_params(config: Config, params_e: dict):
    """(trainable, frozen) split of the encoder params under freeze_phi.

    The reference excludes resnet vars from the E optimizer's var list
    (get_unfrozen_E_vars, trainer_sequence_fc.py:681-685); here the
    frozen subtree is also excluded from differentiation, so the step
    computes no resnet weight grads and Adam allocates no moments for
    them.
    """
    if config.freeze_phi and "resnet_v2_50" in params_e:
        frozen = {"resnet_v2_50": params_e["resnet_v2_50"]}
        trainable = {
            k: v for k, v in params_e.items() if k != "resnet_v2_50"
        }
        return trainable, frozen
    if config.freeze_resnet_stages and "resnet_v2_50" in params_e:
        # Staged fine-tuning: freeze the root conv and the first N-1
        # blocks. Gradients never flow below the first trainable stage
        # (the input is not differentiated), so XLA prunes the entire
        # backward through the frozen prefix — including the
        # worst-geometry convs (root wgrad, block1's C=64 units).
        n = config.freeze_resnet_stages

        def is_frozen(k: str) -> bool:
            return k == "conv1" or any(
                k.startswith(f"block{bi}/") for bi in range(1, n)
            )

        rn = params_e["resnet_v2_50"]
        frozen_rn = {k: v for k, v in rn.items() if is_frozen(k)}
        trainable = {
            **params_e,
            "resnet_v2_50": {
                k: v for k, v in rn.items() if not is_frozen(k)
            },
        }
        return trainable, {"resnet_v2_50": frozen_rn}
    return params_e, {}


def merge_frozen_params(trainable: dict, frozen: dict) -> dict:
    """Inverse of split_frozen_params (one-level-nested dict merge)."""
    out = dict(trainable)
    for k, v in frozen.items():
        out[k] = {**out[k], **v} if k in out else v
    return out


def make_optimizers(config: Config):
    """Two Adams with TF-default hyperparameters
    (trainer_sequence_fc.py:326,752-768)."""
    tx_e = optax.adam(config.e_lr, b1=0.9, b2=0.999, eps=1e-8)
    tx_d = optax.adam(config.d_lr, b1=0.9, b2=0.999, eps=1e-8)
    return tx_e, tx_d


# ---------------------------------------------------------------------------
# Loss computation (the full HMMR objective)
# ---------------------------------------------------------------------------


def loss_weight_table(config: Config) -> Dict[str, float]:
    """Loss-name -> weight map (gather_losses, trainer_sequence_fc.py:
    700-750). The single source of truth: both ``compute_losses``'s
    weighted sums and the Trainer's loss-proportion report use this, so
    the proportions are guaranteed to reflect the optimized objective."""
    weights = {
        "d_pose": config.d_lw_pose,
        "e_const": config.e_lw_const,
        "e_pose": config.e_lw_pose,
        "e_shape": config.e_lw_shape,
        "e_hallucinate": config.e_lw_hallucinate,
    }
    for suffix in ("", "_static", "_dt_future", "_dt_past", "_hal",
                   "_hal_dt_future", "_hal_dt_past"):
        weights["e_kp" + suffix] = config.e_lw_kp
        weights["e_joints" + suffix] = config.e_lw_joints
        weights["e_smpl" + suffix] = config.e_lw_smpl
    return weights


def _delta_slices(dt: int):
    """gt/pred time alignment for a dt head
    (trainer_sequence_fc.py:867-884)."""
    if dt == 0:
        return slice(None), slice(None)
    if dt < 0:   # past: pred[|dt|:] vs gt[:dt]
        return slice(None, dt), slice(abs(dt), None)
    return slice(dt, None), slice(None, -dt)  # future


def compute_losses(
    config: Config,
    hmmr: HmmrModel,
    disc: PoseDiscriminator,
    smpl: SmplModel,
    params_e,
    params_d,
    batch: Batch,
    train: bool = True,
    dropout_rng: Optional[jax.Array] = None,
):
    """Returns (e_loss, d_loss, metrics dict).

    Loss wiring parity: compute_losses_batched / _deltas / _prior
    (trainer_sequence_fc.py:791-1020) with weights from config
    (trainer_sequence_fc.py:280-310).
    """
    b, t = batch.phis.shape[0], config.T
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None

    # Train-mode BN (image mode) must advance the moving averages — the
    # reference executes slim's UPDATE_OPS with e_loss
    # (trainer_sequence_fc.py:747-750). The updated collection rides out
    # through the metrics aux; train_step merges it into params_e.
    mutable = ["batch_stats"] if (train and "batch_stats" in params_e) \
        else False

    if config.use_bfloat16:
        # Mixed precision: the network fwd/bwd (the FLOPs: resnet /
        # temporal convs / IEF / hallucinator) in bf16; outputs cast
        # back so SMPL decode + every loss below stays fp32. Params
        # remain fp32 leaves — the cast is inside the grad graph, so
        # gradients accumulate into fp32 optimizer state. batch_stats
        # stay fp32: train-mode BN never reads them for normalization,
        # and the 0.003-scale moving-average increments would quantize
        # away in bf16.
        apply_e = {
            k: (v if k == "batch_stats" else tree_bf16(v))
            for k, v in params_e.items()
        }
        apply_x = tree_bf16(batch.phis)
    else:
        apply_e, apply_x = params_e, batch.phis

    if mutable:
        out, new_vars = hmmr.apply(
            apply_e, apply_x, train=train, rngs=rngs, mutable=mutable
        )
    else:
        out = hmmr.apply(apply_e, apply_x, train=train, rngs=rngs)
        new_vars = {}

    if config.use_bfloat16:
        cast32 = lambda v: None if v is None else jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), v
        )
        out = type(out)(*[cast32(v) for v in out])

    gt = OmegaGt.create(
        batch.poses_gt, batch.shapes_gt, batch.joints_gt, batch.kps
    )

    # ---- Stack every head into ONE SMPL decode. -----------------------
    heads = [("pred", 0, out.omega_pred)]
    for dt in sorted(out.omegas_delta):
        heads.append(("dt", dt, out.omegas_delta[dt]))
    if out.omega_hal is not None:
        heads.append(("hal", 0, out.omega_hal))
        for dt in sorted(out.omegas_hal_delta):
            heads.append(("hal_dt", dt, out.omegas_hal_delta[dt]))
    stacked = jnp.stack([h[2] for h in heads])          # (H, B, T, 85)
    sm = compute_smpl(
        smpl, stacked, use_optcam=True, want_verts=False,
        fused=config.use_fused_smpl,
    )
    # use_optcam=True -> kps are joints[..., :2]; heads with their own
    # camera (present, hal present) re-project below.

    losses: Dict[str, jax.Array] = {}
    fake_poses = []
    fake_shapes = []
    static_mode = config.use_hmr_only and not config.do_hallucinate

    def head_3d_losses(idx, dt):
        s_gt, s_pr = _delta_slices(dt)
        seq_len = t - abs(dt)
        has_smpl = jnp.repeat(batch.has_3d_smpl, seq_len)
        has_joints = jnp.repeat(batch.has_3d_joints, seq_len)
        lp, ls, lj = L.loss_3d(
            poses_gt=gt.poses_rot[:, s_gt],
            poses_pred=sm.poses_rot[idx][:, s_pr],
            shapes_gt=gt.shapes_tiled(t)[:, s_gt],
            shapes_pred=split_omega(stacked[idx])[2][:, s_pr],
            joints_gt=gt.joints[:, s_gt],
            joints_pred=sm.joints[idx][:, s_pr, :14],
            has_gt3d_smpl=has_smpl,
            has_gt3d_joints=has_joints,
        )
        return lp, ls, lj

    for idx, (kind, dt, raw) in enumerate(heads):
        cams, poses_aa, shapes = split_omega(raw)
        fake_poses.append(sm.poses_rot[idx].reshape(-1, 24, 9))
        fake_shapes.append(shapes.reshape(-1, 10))

        s_gt, s_pr = _delta_slices(dt)

        if kind in ("pred", "hal"):
            # Own camera: project joints with the predicted cam.
            from human_dynamics_tpu.core.projection import orth_proj_idrot

            kps_pred = orth_proj_idrot(
                sm.joints[idx].reshape(b * t, -1, 3),
                cams.reshape(b * t, 3),
            ).reshape(b, t, -1, 2)
            loss_kp = L.keypoint_l1_loss(gt.kps, kps_pred)
        else:
            # dt heads: optimal-camera keypoint loss
            # (trainer_sequence_fc.py:887-901).
            loss_kp, _ = L.keypoint_l1_loss_optcam(
                gt.kps[:, s_gt], sm.kps[idx][:, s_pr]
            )

        if config.use_3d_label:
            lp, ls, lj = head_3d_losses(idx, dt)
        else:
            lp = ls = lj = jnp.zeros(())

        suffix = {
            # HMR-only ablation without hallucination is the reference's
            # "static" path: same math, loss keys named *_static
            # (compute_losses_static, trainer_sequence_fc.py:955-988).
            ("pred", True): "_static" if static_mode else "",
            ("hal", True): "_hal",
        }.get((kind, dt == 0))
        if suffix is None:
            base = "_dt" if kind == "dt" else "_hal_dt"
            suffix = base + ("_future" if dt > 0 else "_past")

        def acc(key, val):
            losses[key] = losses.get(key, 0.0) + val

        acc("e_kp" + suffix, loss_kp)
        acc("e_joints" + suffix, lj)
        acc("e_smpl" + suffix, lp + ls)

    # Beta smoothness on the present head (trainer_sequence_fc.py:827-830);
    # the static path has no temporal const loss (compute_losses_static).
    if not static_mode:
        losses["e_const"] = L.beta_smoothness_loss(
            split_omega(out.omega_pred)[2]
        )

    # Hallucination feature-matching loss.
    if out.hal_strip is not None:
        losses["e_hallucinate"] = L.hallucinator_mse(
            out.movie_strip, out.hal_strip
        )

    # ---- Adversarial prior (trainer_sequence_fc.py:989-1020). ---------
    poses_fake = jnp.concatenate(fake_poses, axis=0)     # (F, 24, 9)
    shapes_fake = jnp.concatenate(fake_shapes, axis=0)
    if batch.poses_real.ndim == 3 and batch.poses_real.shape[-1] == 3:
        # Axis-angle mocap stream: convert on device (the reference
        # converts in its loader, data_loader_sequence.py:209).
        from human_dynamics_tpu.core.rotations import rodrigues

        poses_real = rodrigues(batch.poses_real).reshape(-1, 24, 9)
    else:
        poses_real = batch.poses_real.reshape(-1, 24, 9)

    # Drop global rotation; E sees a frozen critic, D sees detached fakes.
    fake_in = poses_fake[:, 1:]
    real_in = poses_real[:, 1:]
    out_fake_for_e = disc.apply(
        jax.lax.stop_gradient(params_d), fake_in
    )
    disc_in = jnp.concatenate(
        [real_in, jax.lax.stop_gradient(fake_in)], axis=0
    )
    disc_out = disc.apply(params_d, disc_in)
    out_real, out_fake_for_d = jnp.split(disc_out, 2)

    losses["e_pose"] = L.lsgan_encoder_loss(out_fake_for_e)
    losses["d_pose"] = L.lsgan_disc_fake_loss(
        out_fake_for_d
    ) + L.lsgan_disc_real_loss(out_real)
    losses["e_shape"] = L.shape_prior_loss(shapes_fake)

    # ---- Weighted sums (gather_losses, trainer_sequence_fc.py:700-750).
    weights = loss_weight_table(config)

    e_loss = jnp.zeros(())
    d_loss = jnp.zeros(())
    for key, val in losses.items():
        w = weights[key]
        if key.startswith("e"):
            e_loss = e_loss + w * val
        else:
            d_loss = d_loss + w * val

    metrics = dict(losses)
    metrics["e_loss"] = e_loss
    metrics["d_loss"] = d_loss
    if mutable and "batch_stats" in new_vars:
        metrics["_new_batch_stats"] = new_vars["batch_stats"]
    return e_loss, d_loss, metrics


# ---------------------------------------------------------------------------
# The jitted step
# ---------------------------------------------------------------------------


def train_step(
    config: Config,
    hmmr: HmmrModel,
    disc: PoseDiscriminator,
    smpl: SmplModel,
    tx_e,
    tx_d,
    state: TrainState,
    batch: Batch,
    rng: jax.Array,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One simultaneous E/D update (pure; jit/pjit from the caller)."""

    dropout_rng = jax.random.fold_in(rng, state.step)

    # freeze_phi: the resnet is excluded from the differentiated E
    # params entirely (get_unfrozen_E_vars, trainer_sequence_fc.py:
    # 681-685) — no resnet weight grads are computed and the Adam state
    # carries no moments for the ~23M frozen params.
    trainable_e, frozen_e = split_frozen_params(
        config, state.params_e["params"]
    )

    def total_loss(params_e_trainable, params_d_trainable):
        params_e = {
            **state.params_e,
            "params": merge_frozen_params(params_e_trainable, frozen_e),
        }
        params_d = {**state.params_d, "params": params_d_trainable}
        e_loss, d_loss, metrics = compute_losses(
            config, hmmr, disc, smpl, params_e, params_d, batch,
            train=True, dropout_rng=dropout_rng,
        )
        return e_loss + d_loss, metrics

    grads, metrics = jax.grad(
        total_loss, argnums=(0, 1), has_aux=True
    )(trainable_e, state.params_d["params"])
    grads_e, grads_d = grads
    new_batch_stats = metrics.pop("_new_batch_stats", None)

    updates_e, new_opt_e = tx_e.update(
        grads_e, state.opt_state_e, trainable_e
    )
    new_params_e = merge_frozen_params(
        optax.apply_updates(trainable_e, updates_e), frozen_e
    )
    updates_d, new_opt_d = tx_d.update(
        grads_d, state.opt_state_d, state.params_d["params"]
    )
    new_params_d = optax.apply_updates(state.params_d["params"], updates_d)

    params_e_out = {**state.params_e, "params": new_params_e}
    if new_batch_stats is not None:
        params_e_out["batch_stats"] = new_batch_stats

    new_state = TrainState(
        params_e=params_e_out,
        params_d={**state.params_d, "params": new_params_d},
        opt_state_e=new_opt_e,
        opt_state_d=new_opt_d,
        step=state.step + 1,
    )
    return new_state, metrics


class Trainer:
    """Training driver: owns state, the jitted step, logging, checkpoints.

    Replaces the Supervisor loop (trainer_sequence_fc.py:1022-1120):
    auto-resume from the latest checkpoint in model_dir, periodic orbax
    checkpoints, scalar logging (TensorBoard + CSV), loss-proportion
    reports every 500 steps, optional rendered-prediction summaries, and
    jax.profiler trace hooks.
    """

    def __init__(
        self,
        config: Config,
        smpl: SmplModel,
        data_iter=None,
        logger=None,
    ):
        self.config = config
        self.smpl = smpl
        self.data_iter = data_iter
        self.logger = logger
        rng = jax.random.PRNGKey(config.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state, self.hmmr, self.disc = create_train_state(
            config, init_rng
        )
        self.tx_e, self.tx_d = make_optimizers(config)
        self.loss_weights = self._loss_weights()

        # Donating the state lets XLA update params/optimizer moments
        # in place instead of double-buffering them every step (the
        # state is rebound from the step's return before any other use;
        # donation is a no-op on CPU).
        self._jit_step = jax.jit(
            lambda state, batch, rng: train_step(
                config, self.hmmr, self.disc, smpl,
                self.tx_e, self.tx_d, state, batch, rng,
            ),
            donate_argnums=0,
        )

        if config.model_dir:
            self.maybe_restore(config.model_dir)

    def _loss_weights(self) -> Dict[str, float]:
        return loss_weight_table(self.config)

    # ------------------------------------------------------------------
    # Checkpointing (Supervisor auto-restore semantics).
    # ------------------------------------------------------------------

    def save(self) -> Optional[str]:
        if not self.config.model_dir:
            return None
        from human_dynamics_tpu.utils.checkpoint import save_checkpoint

        tree = self.state._asdict()
        if self.config.save_params_only:
            # Eval-only checkpoint: drop the Adam moment pairs (~2/3 of
            # the state bytes). Saving fetches the whole tree to the
            # host; on tunnel-attached deployments that readback is the
            # dominant save cost (docs/train.md), and eval/demo only
            # ever read params_e.
            tree = {k: tree[k] for k in ("params_e", "params_d", "step")}
        return save_checkpoint(
            self.config.model_dir,
            jax.tree_util.tree_map(np.asarray, tree),
            step=int(self.state.step),
        )

    def maybe_restore(self, model_dir: str) -> bool:
        from human_dynamics_tpu.utils.checkpoint import (
            checkpoint_top_keys,
            latest_checkpoint,
            load_checkpoint,
        )

        ckpt = latest_checkpoint(model_dir)
        if ckpt is None:
            return False
        full = self.state._asdict()
        # Structural slim-checkpoint detection (save_params_only saves
        # drop the Adam moment pairs): when the stored keys are readable,
        # restore params-only ONLY when the tree genuinely lacks
        # opt_state — any OTHER load failure (corruption, optax treedef
        # drift, orbax issues) must raise, not silently reset the
        # moments. Formats with no cheap key listing (pickle fallback,
        # foreign orbax metadata layouts) keep the permissive
        # try-full-then-slim behavior.
        stored = checkpoint_top_keys(ckpt)
        slim = {k: full[k] for k in ("params_e", "params_d", "step")}
        if stored is not None:
            target = slim if "opt_state_e" not in stored else full
            tree = load_checkpoint(ckpt, target=target)
        else:
            try:
                tree = load_checkpoint(ckpt, target=full)
            except Exception:
                tree = load_checkpoint(ckpt, target=slim)
        self.state = TrainState(
            params_e=tree["params_e"],
            params_d=tree["params_d"],
            opt_state_e=tree.get("opt_state_e", self.state.opt_state_e),
            opt_state_d=tree.get("opt_state_d", self.state.opt_state_d),
            step=jnp.asarray(int(np.asarray(tree["step"])), jnp.int32),
        )
        if "opt_state_e" not in tree:
            print("Params-only checkpoint: optimizer moments reset")
        print(f"Restored checkpoint {ckpt} (step {int(self.state.step)})")
        return True

    def load_pretrained(self, path: str) -> None:
        """Warm start from a converted reference checkpoint
        (use_pretrained/init_fn, trainer_sequence_fc.py:340-408)."""
        from human_dynamics_tpu.utils.checkpoint import load_variables

        loaded = load_variables(path)
        if isinstance(loaded, tuple):
            hmmr_vars, disc_vars = loaded
        else:
            hmmr_vars, disc_vars = loaded, None

        skipped = []

        def merge(dst, src, prefix=""):
            # Only overwrite variables the model actually has — the
            # reference restores by explicit var list, so e.g. resnet
            # vars in an HMR ckpt are ignored in precomputed-phi mode
            # (trainer_sequence_fc.py:360-390). Adding keys here would
            # also desync params_e from the already-built opt_state tree.
            out = dict(dst)
            for k, v in src.items():
                if k not in out:
                    skipped.append(prefix + k)
                elif isinstance(v, dict) and isinstance(out[k], dict):
                    out[k] = merge(out[k], v, prefix + k + "/")
                else:
                    out[k] = jnp.asarray(v)
            return out

        params_e = merge(self.state.params_e, hmmr_vars)
        params_d = (
            merge(self.state.params_d, disc_vars)
            if disc_vars else self.state.params_d
        )
        self.state = self.state._replace(
            params_e=params_e, params_d=params_d
        )
        if skipped:
            print(
                f"load_pretrained: ignored {len(skipped)} vars absent "
                f"from the model (e.g. {skipped[0]})"
            )

    # ------------------------------------------------------------------
    # Rendered prediction summaries (visualize/visualize_strip,
    # trainer_sequence_fc.py:1134-1282). Without decoded images in the
    # precomputed-phi records, meshes+skeletons render on white.
    # ------------------------------------------------------------------

    def render_summary(self, batch: Batch, max_frames: int = None):
        """Render current predictions for the first batch element into a
        horizontal strip image (H, W*k, 3) uint8."""
        from human_dynamics_tpu.viz.renderer import VisRenderer
        from human_dynamics_tpu.viz.skeleton import (
            draw_skeleton,
            normalized_kp_to_image,
        )

        max_frames = max_frames or self.config.log_img_count
        out = self.hmmr.apply(
            self.state.params_e, batch.phis[:1], train=False
        )
        sm = compute_smpl(
            self.smpl, out.omega_pred[:1], use_optcam=False,
            fused=self.config.use_fused_smpl,
        )
        t = out.omega_pred.shape[1]
        mid = t // 2
        idx = range(
            max(0, mid - max_frames // 2),
            min(t, mid + (max_frames + 1) // 2),
        )

        faces = self.smpl.faces
        img_size = self.config.img_size
        renderer = (
            VisRenderer(img_size=img_size, faces=faces)
            if faces is not None else None
        )
        panels = []
        verts = np.asarray(sm.verts[0])
        kps = np.asarray(sm.kps[0])
        cams = np.asarray(out.omega_pred[0, :, :3])
        gt_kps = np.asarray(batch.kps[0])
        for ti in idx:
            if renderer is not None:
                panel = renderer(verts[ti], cam=cams[ti])
            else:
                panel = np.full((img_size, img_size, 3), 255, np.uint8)
            panel = draw_skeleton(
                panel, normalized_kp_to_image(kps[ti], img_size)
            )
            panel = draw_skeleton(
                panel,
                normalized_kp_to_image(gt_kps[ti, :, :2], img_size),
                draw_edges=False,
                vis=gt_kps[ti, :, 2] > 0,
            )
            panels.append(panel)
        return np.concatenate(panels, axis=1)

    # SMPL joint names for the 23 per-joint discriminator heads
    # (setup_disc_summary, trainer_sequence_fc.py:770-789).
    SMPL_JOINT_NAMES = (
        "Left_Hip", "Right_Hip", "Waist", "Left_Knee", "Right_Knee",
        "Upper_Waist", "Left_Ankle", "Right_Ankle", "Chest", "Left_Toe",
        "Right_Toe", "Base_Neck", "Left_Shoulder", "Right_Shoulder",
        "Upper_Neck", "Left_Arm", "Right_Arm", "Left_Elbow",
        "Right_Elbow", "Left_Wrist", "Right_Wrist", "Left_Finger",
        "Right_Finger",
    )

    def histogram_summary(self, batch: Batch) -> None:
        """Log beta and per-joint discriminator-output histograms
        (trainer_sequence_fc.py:724-742,770-789 parity). One extra
        forward at summary cadence — the hot step stays scalar-only."""
        if self.logger is None:
            return
        from human_dynamics_tpu.core.rotations import rodrigues

        step_no = int(self.state.step)
        out = self.hmmr.apply(self.state.params_e, batch.phis, train=False)
        # In hmr_only mode omega_pred IS the static head (same IEF), so
        # this covers the reference's static/pred branch in one line.
        omega = out.omega_pred
        betas = split_omega(omega)[2]
        self.logger.log_histogram(step_no, "betas", betas)
        if out.omega_hal is not None:
            self.logger.log_histogram(
                step_no, "betas_hal", split_omega(out.omega_hal)[2]
            )

        poses_rot = rodrigues(
            split_omega(omega)[1].reshape(-1, 24, 3)
        ).reshape(-1, 24, 9)
        d_out = self.disc.apply(self.state.params_d, poses_rot[:, 1:])
        self.logger.log_histogram(step_no, "poses_out/all", d_out[:, 23])
        for i, name in enumerate(self.SMPL_JOINT_NAMES):
            self.logger.log_histogram(
                step_no, f"poses_out/{name}", d_out[:, i]
            )

    # ------------------------------------------------------------------

    def step(self, batch: Batch) -> Dict[str, float]:
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, metrics = self._jit_step(self.state, batch, step_rng)
        return metrics

    def train(
        self, num_steps: int, profile_steps: Optional[range] = None
    ) -> Dict[str, float]:
        from human_dynamics_tpu.utils.logging import (
            StepTimer,
            write_loss_proportions,
        )

        assert self.data_iter is not None, "no data iterator"
        metrics = {}
        timer = StepTimer()
        profiling = False
        for i in range(num_steps):
            step_no = int(self.state.step)
            if profile_steps is not None:
                if step_no == profile_steps.start and not profiling:
                    jax.profiler.start_trace(
                        os.path.join(self.config.model_dir or ".",
                                     "profile")
                    )
                    profiling = True
                if profiling and step_no >= profile_steps.stop:
                    jax.profiler.stop_trace()
                    profiling = False

            batch = next(self.data_iter)
            metrics = self.step(batch)
            timer.tick()
            step_no = int(self.state.step)

            if step_no % self.config.log_step == 0:
                m = {k: float(v) for k, v in metrics.items()}
                if self.logger is not None:
                    self.logger.log_scalars(step_no, m)
                print(
                    f"step {step_no}: e_loss={m['e_loss']:.4f} "
                    f"d_loss={m['d_loss']:.4f} "
                    f"({timer.mean_ms:.0f} ms/step)"
                )
            if (self.logger is not None and self.config.log_img_step
                    and step_no % self.config.log_img_step == 0):
                try:
                    strip = self.render_summary(batch)
                    self.logger.log_image(step_no, "pred/strip", strip)
                except Exception as exc:  # vis must never kill training
                    print(f"render_summary failed: {exc}")
                try:
                    self.histogram_summary(batch)
                except Exception as exc:
                    print(f"histogram_summary failed: {exc}")
            if step_no % 500 == 0 and self.config.model_dir:
                write_loss_proportions(
                    self.config.model_dir, step_no,
                    {k: float(v) for k, v in metrics.items()},
                    self.loss_weights,
                )
            if (self.config.save_step
                    and step_no % self.config.save_step == 0):
                self.save()
        if profiling:
            jax.profiler.stop_trace()
        return {k: float(v) for k, v in metrics.items()}
