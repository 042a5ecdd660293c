"""Independent numpy oracle implementations of the reference math.

These follow the *published equations* of the reference codebase
(/root/reference/src/tf_smpl) step by step — sequential FK with 4x4
homogeneous matrices, explicit Rodrigues — and exist purely as a
correctness oracle for the TPU-native implementations, which are organized
completely differently (level-parallel FK, packed skinning matmuls).
"""

import numpy as np


def np_rodrigues(theta):
    """theta (N,3) -> (N,3,3); replicates angle = ||theta + 1e-8||."""
    theta = np.asarray(theta, np.float64)
    angle = np.linalg.norm(theta + 1e-8, axis=1, keepdims=True)
    r = theta / angle
    cos = np.cos(angle)[..., None]
    sin = np.sin(angle)[..., None]
    outer = r[:, :, None] * r[:, None, :]
    k = np.zeros((len(theta), 3, 3))
    k[:, 0, 1] = -r[:, 2]
    k[:, 0, 2] = r[:, 1]
    k[:, 1, 0] = r[:, 2]
    k[:, 1, 2] = -r[:, 0]
    k[:, 2, 0] = -r[:, 1]
    k[:, 2, 1] = r[:, 0]
    eye = np.eye(3)[None]
    return cos * eye + (1 - cos) * outer + sin * k


def np_global_rigid_transformation(rots, joints, parents, rotate_base=False):
    """Sequential 24-step FK, homogeneous 4x4 (batch_lbs.py:133-194)."""
    n = rots.shape[0]
    num_j = len(parents)
    rots = np.asarray(rots, np.float64)
    joints = np.asarray(joints, np.float64)

    root_rot = rots[:, 0]
    if rotate_base:
        rot_x = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
        root_rot = root_rot @ rot_x

    def make_a(r, t):
        a = np.zeros((n, 4, 4))
        a[:, :3, :3] = r
        a[:, :3, 3] = t
        a[:, 3, 3] = 1.0
        return a

    results = [make_a(root_rot, joints[:, 0])]
    for i in range(1, num_j):
        j_here = joints[:, i] - joints[:, parents[i]]
        a_here = make_a(rots[:, i], j_here)
        results.append(results[parents[i]] @ a_here)
    results = np.stack(results, axis=1)  # (N, 24, 4, 4)

    new_j = results[:, :, :3, 3]

    # A = results - init_bone
    js_w0 = np.concatenate([joints, np.zeros((n, num_j, 1))], axis=2)
    init_bone_t = np.einsum("njab,njb->nja", results, js_w0)
    a_rel = results.copy()
    a_rel[:, :, :, 3] -= init_bone_t
    return new_j, a_rel


def np_smpl_forward(model_np, beta, theta, rotate_base=False):
    """Full SMPL forward per batch_smpl.py:89-162.

    model_np: dict with v_template (V,3), shapedirs (10,V*3),
        posedirs (207,V*3), j_regressor (V,24), lbs_weights (V,24),
        joint_regressor (V,K), parents tuple.
    """
    beta = np.asarray(beta, np.float64)
    theta = np.asarray(theta, np.float64).reshape(len(beta), 72)
    n = len(beta)
    v_template = np.asarray(model_np["v_template"], np.float64)
    v = len(v_template)

    v_shaped = (beta @ np.asarray(model_np["shapedirs"], np.float64)).reshape(
        n, v, 3
    ) + v_template
    j_reg = np.asarray(model_np["j_regressor"], np.float64)
    joints_rest = np.stack(
        [v_shaped[:, :, c] @ j_reg for c in range(3)], axis=2
    )

    rots = np_rodrigues(theta.reshape(-1, 3)).reshape(n, 24, 3, 3)
    pose_feature = (rots[:, 1:] - np.eye(3)).reshape(n, 207)
    v_posed = (
        pose_feature @ np.asarray(model_np["posedirs"], np.float64)
    ).reshape(n, v, 3) + v_shaped

    j_posed, a_rel = np_global_rigid_transformation(
        rots, joints_rest, model_np["parents"], rotate_base
    )

    w = np.asarray(model_np["lbs_weights"], np.float64)
    t_mat = np.einsum("vj,njab->nvab", w, a_rel)  # (N,V,4,4)
    v_homo = np.concatenate([v_posed, np.ones((n, v, 1))], axis=2)
    verts = np.einsum("nvab,nvb->nva", t_mat, v_homo)[:, :, :3]

    joint_reg = np.asarray(model_np["joint_regressor"], np.float64)
    kp3d = np.stack([verts[:, :, c] @ joint_reg for c in range(3)], axis=2)
    return dict(
        verts=verts, joints=kp3d, rots=rots, j_posed=j_posed,
        v_shaped=v_shaped, v_posed=v_posed,
    )


def np_orth_proj_idrot(x, camera):
    """projection.py:16-29."""
    cam = np.asarray(camera, np.float64).reshape(len(x), 1, 3)
    x_trans = np.asarray(x, np.float64)[:, :, :2] + cam[:, :, 1:]
    return cam[:, :, 0:1] * x_trans


def np_procrustes2d_vis(x, x_target):
    """projection.py:48-104, with true matrix inverse."""
    x = np.asarray(x, np.float64)[..., :2]
    x_target = np.asarray(x_target, np.float64)
    vis = (x_target[:, :, 2] > 0).astype(np.float64)
    vis_vec = vis[..., None]
    xt = x_target[:, :, :2]

    num_vis = vis.sum(axis=1, keepdims=True)[..., None]
    mu1 = (vis_vec * x).sum(axis=1, keepdims=True) / num_vis
    mu2 = (vis_vec * xt).sum(axis=1, keepdims=True) / num_vis
    xmu = vis_vec * (x - mu1)
    y = vis_vec * (xt - mu2)

    eps = 1e-6 * np.eye(2)
    cams = []
    for i in range(len(x)):
        a_inv = np.linalg.inv(xmu[i].T @ xmu[i] + eps)
        b = xmu[i].T @ y[i]
        scale = np.trace(a_inv @ b) / 2.0
        scale = np.clip(scale, 0.7, 10.0)
        trans = mu2[i, 0] / scale - mu1[i, 0]
        cams.append(np.concatenate([[scale], trans]))
    return np.stack(cams)


def model_to_np(model):
    """SmplModel -> plain numpy dict for the oracle."""
    return dict(
        v_template=np.asarray(model.v_template),
        shapedirs=np.asarray(model.shapedirs),
        posedirs=np.asarray(model.posedirs),
        j_regressor=np.asarray(model.j_regressor),
        lbs_weights=np.asarray(model.lbs_weights),
        joint_regressor=np.asarray(model.joint_regressor),
        parents=model.parents,
    )
