"""TF-graph forward parity: JAX modules vs hand-built TF executions of
the reference architecture.

The strongest available derisking of the bit-for-bit pkl target while
the released checkpoint assets are absent: every layout / padding / eps
convention of the reference graph is rebuilt here in TensorFlow (2.x
eager, plain tf.nn ops — the slim/contrib layers spelled out by hand
from their documented semantics), loaded with THE SAME weights via
``export_to_slim_names``, and the fp32 activations are asserted to
agree end-to-end through a full temporal window.

Reference semantics encoded by the oracles:
- slim conv2d_same: stride 1 -> 'SAME'; stride s -> explicit
  (k-1)//2 / k-1-(k-1)//2 pad then VALID (resnet_utils.conv2d_same).
- resnet_v2 bottleneck: preact BN(eps 1e-5)+relu feeds both branches;
  identity shortcut subsamples the RAW input; conv1/conv2 carry BN (no
  bias), conv3 + projection shortcut carry biases (no BN); stride sits
  on the 3x3 conv (/root/reference/src/models.py:50-77 via
  slim resnet_v2_50).
- root: conv2d_same 7x7/2 WITH bias, then 3x3/2 SAME max pool;
  postnorm BN+relu; spatial mean pool.
- tf.contrib.layers.group_norm: 32 groups, group-major channel split,
  stats over (T, 1, C/32), eps 1e-6 (models.py:153-161).
- az_fc_block2: gn -> relu -> conv[3,1] SAME -> gn -> relu -> conv ->
  +skip on an NT1C tensor (models.py:144-228).
- encoder_fc3_dropout / hmr_ief / call_hmr_ief: 3 shared-weight IEF
  stages of fc1024-relu x2 + linear head; delta heads start from
  pred[3:75], reattach cam=[1,0,0] and the start beta
  (models.py:80-116,299-415).
- fc2_res hallucinator: fc-fc-fc + residual (models.py:270-296).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from human_dynamics_tpu.models.hmmr import HmmrModel  # noqa: E402
from human_dynamics_tpu.utils.checkpoint import (  # noqa: E402
    export_to_slim_names,
)

RNG = np.random.RandomState(77)
BN_EPS = 1e-5
GN_EPS = 1e-6
RESNET_UNITS = {1: 3, 2: 4, 3: 6, 4: 3}
RESNET_DEPTHS = {1: 256, 2: 512, 3: 1024, 4: 2048}


# ---------------------------------------------------------------------------
# TF oracles (hand-built reference graph, weights injected as constants)
# ---------------------------------------------------------------------------


def tf_conv2d_same(x, w, stride, bias=None):
    """slim resnet_utils.conv2d_same."""
    k = int(w.shape[0])
    if stride == 1:
        y = tf.nn.conv2d(x, w, strides=1, padding="SAME")
    else:
        beg = (k - 1) // 2
        end = k - 1 - beg
        x = tf.pad(x, [[0, 0], [beg, end], [beg, end], [0, 0]])
        y = tf.nn.conv2d(x, w, strides=stride, padding="VALID")
    if bias is not None:
        y = y + bias
    return y


def tf_bn(x, v, prefix):
    """Inference-mode slim batch_norm (eps 1e-5, scale=True)."""
    gamma = v[prefix + "/gamma"]
    beta = v[prefix + "/beta"]
    mean = v[prefix + "/moving_mean"]
    var = v[prefix + "/moving_variance"]
    return (x - mean) * tf.math.rsqrt(var + BN_EPS) * gamma + beta


def tf_resnet_v2_50(images, v):
    """(N, H, W, 3) -> (N, 2048) phi, slim resnet_v2_50 inference."""
    r = "resnet_v2_50"
    x = tf_conv2d_same(
        tf.constant(images, tf.float32),
        v[f"{r}/conv1/weights"], 2, v[f"{r}/conv1/biases"],
    )
    x = tf.nn.max_pool2d(x, 3, 2, padding="SAME")
    for b in (1, 2, 3, 4):
        depth = RESNET_DEPTHS[b]
        for u in range(1, RESNET_UNITS[b] + 1):
            stride = 2 if (u == RESNET_UNITS[b] and b != 4) else 1
            sp = f"{r}/block{b}/unit_{u}/bottleneck_v2"
            preact = tf.nn.relu(tf_bn(x, v, f"{sp}/preact"))
            if f"{sp}/shortcut/weights" in v:
                shortcut = tf.nn.conv2d(
                    preact, v[f"{sp}/shortcut/weights"], stride, "SAME"
                ) + v[f"{sp}/shortcut/biases"]
            else:
                # subsample = max_pool [1,1] stride s on the RAW input.
                shortcut = (
                    x if stride == 1
                    else tf.nn.max_pool2d(x, 1, stride, padding="SAME")
                )
            h = tf.nn.conv2d(preact, v[f"{sp}/conv1/weights"], 1, "SAME")
            h = tf.nn.relu(tf_bn(h, v, f"{sp}/conv1/BatchNorm"))
            h = tf_conv2d_same(h, v[f"{sp}/conv2/weights"], stride)
            h = tf.nn.relu(tf_bn(h, v, f"{sp}/conv2/BatchNorm"))
            h = tf.nn.conv2d(
                h, v[f"{sp}/conv3/weights"], 1, "SAME"
            ) + v[f"{sp}/conv3/biases"]
            x = shortcut + h
    x = tf.nn.relu(tf_bn(x, v, f"{r}/postnorm"))
    return tf.reduce_mean(x, axis=[1, 2])


def tf_group_norm(x, gamma, beta, groups=32):
    """contrib group_norm on NT1C: stats over (T, 1, C/groups),
    group-major channel split, eps 1e-6."""
    shape = tf.shape(x)
    n, t, c = shape[0], shape[1], int(x.shape[-1])
    g = tf.reshape(x, [n, t, 1, groups, c // groups])
    mean, var = tf.nn.moments(g, axes=[1, 2, 4], keepdims=True)
    g = (g - mean) * tf.math.rsqrt(var + GN_EPS)
    out = tf.reshape(g, [n, t, 1, c])
    return out * gamma + beta


def tf_az_fc2_groupnorm(phi, v, num_layers=3):
    """(B, T, C) -> movie strip, az_fc_block2 stack on NT1C."""
    net = tf.expand_dims(tf.constant(phi, tf.float32), axis=2)
    for i in range(num_layers):
        gn1 = tf_group_norm(
            net,
            v[f"AZ_FC_block_preact_gn1block_{i}/gamma"],
            v[f"AZ_FC_block_preact_gn1block_{i}/beta"],
        )
        h = tf.nn.conv2d(
            tf.nn.relu(gn1),
            v[f"AZ_FC_block2_conv1block_{i}/weights"], 1, "SAME",
        ) + v[f"AZ_FC_block2_conv1block_{i}/biases"]
        gn2 = tf_group_norm(
            h,
            v[f"AZ_FC_block_preact_gn2block_{i}/gamma"],
            v[f"AZ_FC_block_preact_gn2block_{i}/beta"],
        )
        h = tf.nn.conv2d(
            tf.nn.relu(gn2),
            v[f"AZ_FC_block2_conv2block_{i}/weights"], 1, "SAME",
        ) + v[f"AZ_FC_block2_conv2block_{i}/biases"]
        net = net + h
    return tf.squeeze(net, axis=2)


def tf_fc3(state, v, scope):
    """encoder_fc3_dropout at inference: fc1024-relu x2 + linear."""
    h = tf.nn.relu(
        state @ v[f"{scope}/3D_module/fc1/weights"]
        + v[f"{scope}/3D_module/fc1/biases"]
    )
    h = tf.nn.relu(
        h @ v[f"{scope}/3D_module/fc2/weights"]
        + v[f"{scope}/3D_module/fc2/biases"]
    )
    return (
        h @ v[f"{scope}/3D_module/fc3/weights"]
        + v[f"{scope}/3D_module/fc3/biases"]
    )


def tf_hmr_ief(phi, omega_start, v, scope, num_stage=3):
    theta = omega_start
    for _ in range(num_stage):
        state = tf.concat([phi, theta], axis=1)
        theta = theta + tf_fc3(state, v, scope)
    return theta


def tf_call_hmr_ief(phi, omega_mean, v, delta_t_values=(-5, 5)):
    """Present + delta heads with use_optcam=True, use_delta_from_pred."""
    phi = tf.constant(phi, tf.float32)
    present = tf_hmr_ief(phi, omega_mean, v, "single_view_ief")
    deltas = {}
    beta = present[:, -10:]
    start72 = present[:, 3:75]
    n = int(phi.shape[0])
    cam = tf.concat([tf.ones([n, 1]), tf.zeros([n, 2])], axis=1)
    for dt in delta_t_values:
        key = f"past{abs(dt)}" if dt < 0 else f"future{dt}"
        pose72 = tf_hmr_ief(
            phi, start72, v, f"single_view_ief_{key}"
        )
        deltas[dt] = tf.concat([cam, pose72, beta], axis=1)
    return present, deltas


def tf_fc2_res(phi, v):
    h = tf.nn.relu(
        phi @ v["fc2_res/fc1/weights"] + v["fc2_res/fc1/biases"]
    )
    h = tf.nn.relu(h @ v["fc2_res/fc2/weights"] + v["fc2_res/fc2/biases"])
    return phi + (
        h @ v["fc2_res/fc3/weights"] + v["fc2_res/fc3/biases"]
    )


# ---------------------------------------------------------------------------
# Fixtures: one full-size model, weights exported once
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def model_and_slim():
    model = HmmrModel(include_resnet=True, feature_dim=2048)
    images = jnp.zeros((1, 1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), images)
    # Perturb BN/GN stats & params so norms are non-trivial.
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    rng = np.random.RandomState(9)
    for k in flat:
        leaf = np.asarray(flat[k])
        name = k[-1]
        if name in ("moving_variance",):
            flat[k] = jnp.asarray(
                leaf + rng.uniform(0.05, 0.5, leaf.shape).astype(
                    np.float32)
            )
        elif name in ("moving_mean", "bias", "beta"):
            flat[k] = jnp.asarray(
                leaf + rng.randn(*leaf.shape).astype(np.float32) * 0.05
            )
        elif name in ("gamma", "scale") and leaf.ndim == 1:
            flat[k] = jnp.asarray(
                leaf + rng.uniform(-0.2, 0.2, leaf.shape).astype(
                    np.float32)
            )
    variables = flax.traverse_util.unflatten_dict(flat)
    slim = export_to_slim_names(variables)
    slim = {k: tf.constant(a, tf.float32) for k, a in slim.items()}
    return model, variables, slim


def test_resnet_trunk_matches_tf(model_and_slim):
    """conv2d_same padding, preact ordering, BN eps, identity-shortcut
    subsampling, stride placement, root bias, maxpool, postnorm, pool."""
    model, variables, slim = model_and_slim
    images = RNG.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1

    want = np.asarray(tf_resnet_v2_50(images, slim))
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(images[None]), train=False,
            method=lambda m, im, train: m.encode_images(im, train),
        )[0]
    )
    assert want.shape == got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_temporal_encoder_matches_tf(model_and_slim):
    """GroupNorm axes/eps/grouping + [3,1] SAME convs + residual adds."""
    model, variables, slim = model_and_slim
    phi = (RNG.randn(2, 13, 2048) * 0.5).astype(np.float32)

    want = np.asarray(tf_az_fc2_groupnorm(phi, slim))
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(phi), train=False,
            method=lambda m, p, train: m.temporal_encoder(p),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_hallucinator_matches_tf(model_and_slim):
    model, variables, slim = model_and_slim
    phi = (RNG.randn(2, 5, 2048) * 0.5).astype(np.float32)
    want = np.asarray(tf_fc2_res(tf.constant(phi), slim))
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(phi), train=False,
            method=lambda m, p, train: m.hallucinator(p),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_full_window_forward_matches_tf(model_and_slim):
    """End-to-end window: images -> resnet -> temporal -> IEF chain
    (present + both delta heads with optcam camera/beta reattach) vs the
    composed TF oracle. Any layout/eps/padding drift fails here."""
    model, variables, slim = model_and_slim
    b, t = 1, 13
    images = (RNG.rand(b, t, 64, 64, 3).astype(np.float32) * 2 - 1)

    # TF oracle pipeline.
    phi_tf = tf_resnet_v2_50(images.reshape(b * t, 64, 64, 3), slim)
    strip_tf = tf_az_fc2_groupnorm(
        np.asarray(phi_tf).reshape(b, t, 2048), slim
    )
    omega_mean = tf.tile(slim["mean_param"], [b * t, 1])
    present_tf, deltas_tf = tf_call_hmr_ief(
        np.asarray(strip_tf).reshape(b * t, 2048), omega_mean, slim
    )

    out = model.apply(variables, jnp.asarray(images), train=False)

    np.testing.assert_allclose(
        np.asarray(out.phi[0]), np.asarray(phi_tf),
        atol=2e-4, rtol=1e-3, err_msg="phi",
    )
    np.testing.assert_allclose(
        np.asarray(out.movie_strip), np.asarray(strip_tf),
        atol=3e-4, rtol=1e-3, err_msg="movie strip",
    )
    np.testing.assert_allclose(
        np.asarray(out.omega_pred.reshape(b * t, -1)),
        np.asarray(present_tf),
        atol=5e-4, rtol=1e-3, err_msg="omega_pred",
    )
    for dt, want in deltas_tf.items():
        np.testing.assert_allclose(
            np.asarray(out.omegas_delta[dt].reshape(b * t, -1)),
            np.asarray(want),
            atol=5e-4, rtol=1e-3, err_msg=f"omega delta {dt}",
        )


# ---------------------------------------------------------------------------
# Discriminator + optcam-loss graph conventions (the two remaining graph
# pieces a converted checkpoint's training resume exercises).
# ---------------------------------------------------------------------------


def tf_pose_discriminator(poses_rot, v):
    """PoseDiscriminator.get_output
    (/root/reference/src/discriminators.py:15-78): (N, 23, 1, 9) ->
    1x1 conv(32) relu x2 -> 23 per-joint linear heads + flatten ->
    fc1024 relu x2 -> fc1; output (N, 24) logits."""
    n = poses_rot.shape[0]
    x = tf.constant(poses_rot.reshape(n, 23, 1, 9), tf.float32)
    x = tf.nn.relu(
        tf.nn.conv2d(x, v["D_pose/D_conv1/weights"], 1, "SAME")
        + v["D_pose/D_conv1/biases"]
    )
    x = tf.nn.relu(
        tf.nn.conv2d(x, v["D_pose/D_conv2/weights"], 1, "SAME")
        + v["D_pose/D_conv2/biases"]
    )
    theta_out = []
    for i in range(23):
        theta_out.append(
            x[:, i, :, :] @ v[f"D_pose/pose_out_j{i}/weights"]
            + v[f"D_pose/pose_out_j{i}/biases"]
        )                                         # each (N, 1, 1)
    theta_all = tf.squeeze(tf.stack(theta_out, axis=1))  # (N, 23)
    flat = tf.reshape(x, (n, 23 * 32))            # slim.flatten
    h = tf.nn.relu(
        flat @ v["D_pose/D_alljoints_fc1/weights"]
        + v["D_pose/D_alljoints_fc1/biases"]
    )
    h = tf.nn.relu(
        h @ v["D_pose/D_alljoints_fc2/weights"]
        + v["D_pose/D_alljoints_fc2/biases"]
    )
    all_out = (h @ v["D_pose/D_alljoints_out/weights"]
               + v["D_pose/D_alljoints_out/biases"])
    return tf.concat([theta_all, all_out], axis=1)


def test_pose_discriminator_matches_tf():
    """Per-joint-Dense == 1x1-conv equivalence, slim.flatten ordering,
    the 23 stacked heads vs the reference's 23 separate scopes."""
    from human_dynamics_tpu.models.discriminator import PoseDiscriminator

    disc = PoseDiscriminator()
    poses_rot = RNG.randn(4, 23, 9).astype(np.float32)
    params = disc.init(jax.random.PRNGKey(11), jnp.asarray(poses_rot))

    p = params["params"]
    slim_d = {}
    for conv in ("D_conv1", "D_conv2"):
        k = np.asarray(p[conv]["kernel"])         # (9|32, 32)
        slim_d[f"D_pose/{conv}/weights"] = tf.constant(
            k.reshape(1, 1, *k.shape), tf.float32
        )
        slim_d[f"D_pose/{conv}/biases"] = tf.constant(
            np.asarray(p[conv]["bias"]), tf.float32
        )
    for j in range(23):
        slim_d[f"D_pose/pose_out_j{j}/weights"] = tf.constant(
            np.asarray(p["per_joint_w"])[j].reshape(32, 1), tf.float32
        )
        slim_d[f"D_pose/pose_out_j{j}/biases"] = tf.constant(
            np.asarray(p["per_joint_b"])[j].reshape(1), tf.float32
        )
    for fc in ("D_alljoints_fc1", "D_alljoints_fc2", "D_alljoints_out"):
        slim_d[f"D_pose/{fc}/weights"] = tf.constant(
            np.asarray(p[fc]["kernel"]), tf.float32
        )
        slim_d[f"D_pose/{fc}/biases"] = tf.constant(
            np.asarray(p[fc]["bias"]), tf.float32
        )

    want = np.asarray(tf_pose_discriminator(poses_rot, slim_d))
    got = np.asarray(disc.apply(params, jnp.asarray(poses_rot)))
    assert got.shape == want.shape == (4, 24)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def tf_procrustes2d_vis(x, x_target):
    """projection.py:48-104 verbatim conventions: vis threshold,
    eps*I-regularized 2x2 inverse, trace/2 scale, [0.7, 10] clip."""
    vis = tf.cast(x_target[:, :, 2] > 0, tf.float32)
    vis_vec = tf.expand_dims(vis, 2)
    x_target_xy = x_target[:, :, :2]
    x_vis = vis_vec * x
    x_target_vis = vis_vec * x_target_xy
    num_vis = tf.expand_dims(tf.reduce_sum(vis, 1, keepdims=True), 2)
    mu1 = tf.reduce_sum(x_vis, 1, keepdims=True) / num_vis
    mu2 = tf.reduce_sum(x_target_vis, 1, keepdims=True) / num_vis
    xmu = vis_vec * (x - mu1)
    y = vis_vec * (x_target_xy - mu2)
    eps = 1e-6 * tf.eye(2)
    Ainv = tf.linalg.inv(tf.matmul(xmu, xmu, transpose_a=True) + eps)
    B = tf.matmul(xmu, y, transpose_a=True)
    scale = tf.expand_dims(tf.linalg.trace(tf.matmul(Ainv, B)) / 2.0, 1)
    scale = tf.clip_by_value(scale, 0.7, 10)
    trans = tf.squeeze(mu2) / scale - tf.squeeze(mu1)
    return tf.concat([scale, trans], 1)


def tf_loss_e_kp_optcam(kp_gt, kp_pred):
    """compute_loss_e_kp_optcam (/root/reference/src/ops.py:14-56):
    best-cam solve + idrot reprojection + visibility-weighted
    absolute_difference (SUM_BY_NONZERO_WEIGHTS)."""
    b, t = kp_gt.shape[:2]
    gt = tf.constant(kp_gt.reshape(b * t, -1, 3), tf.float32)
    pred = tf.constant(kp_pred.reshape(b * t, -1, 2), tf.float32)
    best_cam = tf.stop_gradient(tf_procrustes2d_vis(pred, gt))
    cam = tf.reshape(best_cam, [-1, 1, 3])
    pred_sim = cam[:, :, :1] * (pred + cam[:, :, 1:])
    gt_flat = tf.reshape(gt, (-1, 3))
    pred_flat = tf.reshape(pred_sim, (-1, 2))
    vis = tf.expand_dims(gt_flat[:, 2], 1)
    loss = tf.compat.v1.losses.absolute_difference(
        gt_flat[:, :2], pred_flat, weights=vis
    )
    return loss, tf.reshape(best_cam, (b, t, 3))


def test_optcam_kp_loss_matches_tf():
    """Closed-form 2x2 solve vs TF's matrix_inverse, the scale clip,
    and the SUM_BY_NONZERO_WEIGHTS L1 reduction, end-to-end."""
    from human_dynamics_tpu.train.losses import keypoint_l1_loss_optcam

    b, t, k = 2, 5, 25
    kp_pred = (RNG.randn(b, t, k, 2) * 0.4).astype(np.float32)
    kp_gt = np.zeros((b, t, k, 3), np.float32)
    # gt = a known similarity transform of pred + noise, mixed visibility
    # (every frame keeps >= 3 visible points).
    kp_gt[..., :2] = (
        1.7 * (kp_pred + np.array([0.1, -0.2], np.float32))
        + RNG.randn(b, t, k, 2).astype(np.float32) * 0.05
    )
    vis = (RNG.rand(b, t, k) > 0.3).astype(np.float32)
    vis[..., :3] = 1.0
    kp_gt[..., 2] = vis

    want_loss, want_cam = tf_loss_e_kp_optcam(kp_gt, kp_pred)
    got_loss, got_cam = keypoint_l1_loss_optcam(
        jnp.asarray(kp_gt), jnp.asarray(kp_pred)
    )
    np.testing.assert_allclose(
        float(got_loss), float(want_loss), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_cam), np.asarray(want_cam), atol=1e-4, rtol=1e-3
    )
