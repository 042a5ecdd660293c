"""SMPL body model, TPU-native.

Re-design of /root/reference/src/tf_smpl/batch_smpl.py (class SMPL) and the
forward-kinematics kernel in batch_lbs.py:133-194 for JAX/XLA on TPU:

- Model constants live in an immutable ``SmplModel`` container of device
  arrays (converted once from the original chumpy pickle to npz; no chumpy
  at runtime — see SURVEY.md §2.2).
- The 24-joint kinematic chain is evaluated *level-parallel*: joints are
  grouped by tree depth (SMPL has 8 levels) and each level is one batched
  3x3 matmul, instead of the reference's 23-step sequential loop
  (batch_lbs.py:170-177). Same math, ~3x fewer dependent steps.
- Blend shapes and skinning are shaped as large single matmuls so XLA can
  tile them onto the MXU: shape blendshapes (N,10)x(10,V*3), pose
  blendshapes (N,207)x(207,V*3), and skinning (V,24)x(N,24,12) with the
  per-joint rotation+translation packed into 12 columns.

Dimensional contract (SURVEY.md §2.1): beta 10, theta 24*3, verts 6890x3,
J_regressor -> 24 joints, cocoplus regressor -> 19 kps (lsp = first 14).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from human_dynamics_tpu.core.rotations import rodrigues

# SMPL kinematic tree: parents[i] is the parent joint of joint i (root = -1).
SMPL_PARENTS: Tuple[int, ...] = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
    19, 20, 21,
)
NUM_JOINTS = 24
NUM_POSE_BASIS = 207  # 23 joints x 9 rotation entries


@dataclasses.dataclass(frozen=True)
class SmplModel:
    """Immutable SMPL constants (device arrays + static metadata).

    Layouts follow the reference's transposed-for-matmul convention
    (batch_smpl.py:44-63): shapedirs (num_betas, V*3), posedirs (207, V*3),
    j_regressor (V, 24), joint_regressor (V, K).
    """

    v_template: jax.Array          # (V, 3)
    shapedirs: jax.Array           # (num_betas, V*3)
    posedirs: jax.Array            # (207, V*3)
    j_regressor: jax.Array         # (V, 24)
    lbs_weights: jax.Array         # (V, 24)
    joint_regressor: jax.Array     # (V, K) cocoplus (K=19) or lsp (K=14)
    parents: Tuple[int, ...] = SMPL_PARENTS
    faces: Optional[np.ndarray] = None  # (F, 3) int, rendering only

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[0]

    @property
    def num_kps(self) -> int:
        return self.joint_regressor.shape[1]

    def with_joint_type(self, joint_type: str) -> "SmplModel":
        """Returns a model whose keypoint regressor is cocoplus or lsp.

        Mirrors batch_smpl.py:81-87 (lsp = first 14 cocoplus columns).
        """
        if joint_type == "cocoplus":
            return self
        if joint_type == "lsp":
            return dataclasses.replace(
                self, joint_regressor=self.joint_regressor[:, :14]
            )
        raise ValueError(f"Unknown joint type: {joint_type!r}")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SmplForward:
    """Result of one SMPL forward pass.

    verts: (N, V, 3) posed mesh vertices (None if skip_verts).
    joints: (N, K, 3) regressed keypoints (cocoplus-19 or lsp-14).
    rots: (N, 24, 3, 3) per-joint rotation matrices (Rodrigues of theta).
    j_posed: (N, 24, 3) posed SMPL joint locations (reference's
        J_transformed, batch_smpl.py:136).
    """

    verts: Optional[jax.Array]
    joints: jax.Array
    rots: jax.Array
    j_posed: jax.Array

    def tree_flatten(self):
        return (self.verts, self.joints, self.rots, self.j_posed), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _fk_levels(parents: Tuple[int, ...]):
    """Group non-root joints by kinematic-tree depth (static schedule)."""
    depth = [0] * len(parents)
    for i in range(1, len(parents)):
        depth[i] = depth[parents[i]] + 1
    levels = []
    for d in range(1, max(depth) + 1):
        idx = tuple(i for i in range(len(parents)) if depth[i] == d)
        levels.append(idx)
    return levels


def global_rigid_transformation(
    rots: jax.Array,
    joints: jax.Array,
    parents: Tuple[int, ...] = SMPL_PARENTS,
    rotate_base: bool = False,
):
    """Forward kinematics over the SMPL tree, level-parallel.

    Args:
        rots: (N, 24, 3, 3) per-joint local rotations.
        joints: (N, 24, 3) rest-pose joint locations.
        parents: static parent indices.
        rotate_base: if True, rotate the root by 180deg about x
            (batch_lbs.py:151-156).

    Returns:
        j_posed: (N, 24, 3) world joint locations.
        rel_rot: (N, 24, 3, 3) world rotations (for skinning).
        rel_t: (N, 24, 3) skinning translations = world_t - world_R @ j_rest
            (the reference's ``A = results - init_bone`` relative transform,
            batch_lbs.py:185-192, with the 4x4 padding elided).

    Reference: batch_global_rigid_transformation
    (/root/reference/src/tf_smpl/batch_lbs.py:133-194). The reference walks
    joints 1..23 sequentially; here each tree *level* is a single batched
    matmul (SMPL depth = 8), which XLA maps onto the MXU with 8 dependent
    steps instead of 23.
    """
    root_rot = rots[:, 0]
    if rotate_base:
        rot_x = jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]],
            dtype=rots.dtype,
        )
        root_rot = jnp.einsum("nij,jk->nik", root_rot, rot_x)

    n = rots.shape[0]
    num_j = len(parents)
    # Relative bone vectors: j_rel[i] = J[i] - J[parent[i]] (root keeps J[0]).
    parent_idx = np.array([max(p, 0) for p in parents])
    j_rel = joints - jnp.where(
        jnp.arange(num_j)[None, :, None] == 0,
        0.0,
        joints[:, parent_idx],
    )

    world_rot = jnp.zeros((n, num_j, 3, 3), rots.dtype)
    world_t = jnp.zeros((n, num_j, 3), rots.dtype)
    world_rot = world_rot.at[:, 0].set(root_rot)
    world_t = world_t.at[:, 0].set(joints[:, 0])

    for level in _fk_levels(parents):
        idx = np.array(level)
        pidx = np.array([parents[i] for i in level])
        parent_r = world_rot[:, pidx]                       # (N, L, 3, 3)
        parent_t = world_t[:, pidx]                         # (N, L, 3)
        local_r = rots[:, idx]
        local_t = j_rel[:, idx]
        new_r = jnp.einsum("nlij,nljk->nlik", parent_r, local_r)
        new_t = (
            jnp.einsum("nlij,nlj->nli", parent_r, local_t) + parent_t
        )
        world_rot = world_rot.at[:, idx].set(new_r)
        world_t = world_t.at[:, idx].set(new_t)

    # Skinning-relative translation (reference init_bone subtraction).
    rel_t = world_t - jnp.einsum("njik,njk->nji", world_rot, joints)
    return world_t, world_rot, rel_t


def smpl_forward(
    model: SmplModel,
    beta: jax.Array,
    theta: jax.Array,
    skip_verts: bool = False,
    rotate_base: bool = False,
) -> SmplForward:
    """Posed SMPL mesh + regressed keypoints for a batch of (beta, theta).

    Args:
        model: SMPL constants.
        beta: (N, 10) shape coefficients.
        theta: (N, 72) or (N, 24, 3) axis-angle pose (incl. global rot).
        skip_verts: if True, stop after joint FK (verts=None) — used by
            callers that only need 3D joints.

    Returns:
        SmplForward(verts, joints, rots, j_posed).

    Reference: SMPL.__call__ (/root/reference/src/tf_smpl/batch_smpl.py:89-162).
    """
    n = beta.shape[0]
    v = model.num_verts
    dtype = beta.dtype

    # 1. Shape blend shapes: (N,10)x(10,V*3) -> (N,V,3).
    v_shaped = (
        jnp.matmul(beta, model.shapedirs).reshape(n, v, 3) + model.v_template
    )

    # 2. Shape-dependent joint locations: (N,V)x(V,24) per coordinate.
    joints_rest = jnp.einsum("nvc,vj->njc", v_shaped, model.j_regressor)

    # 3. Rodrigues + pose blendshapes (R[1:] - I on 23 joints).
    rots = rodrigues(theta.reshape(n, NUM_JOINTS, 3))
    pose_feature = (
        rots[:, 1:] - jnp.eye(3, dtype=dtype)
    ).reshape(n, NUM_POSE_BASIS)
    v_posed = (
        jnp.matmul(pose_feature, model.posedirs).reshape(n, v, 3) + v_shaped
    )

    # 4. Forward kinematics.
    j_posed, world_rot, rel_t = global_rigid_transformation(
        rots, joints_rest, model.parents, rotate_base=rotate_base
    )

    if skip_verts:
        # Without verts we cannot regress cocoplus joints; return SMPL joints.
        return SmplForward(None, j_posed, rots, j_posed)

    # 5. Linear blend skinning. Pack (R | t) as 12 columns so the weight
    # combination is one matmul: (V,24) x (N,24,12) -> (N,V,12).
    rt = jnp.concatenate(
        [world_rot.reshape(n, NUM_JOINTS, 9), rel_t], axis=-1
    )  # (N, 24, 12)
    blended = jnp.einsum("vj,njk->nvk", model.lbs_weights, rt)  # (N, V, 12)
    blend_rot = blended[..., :9].reshape(n, v, 3, 3)
    blend_t = blended[..., 9:]
    verts = (
        jnp.einsum("nvij,nvj->nvi", blend_rot, v_posed) + blend_t
    )

    # 6. Keypoint regression (cocoplus-19 / lsp-14).
    joints = jnp.einsum("nvc,vk->nkc", verts, model.joint_regressor)
    return SmplForward(verts, joints, rots, j_posed)


# ---------------------------------------------------------------------------
# Model loading / conversion
# ---------------------------------------------------------------------------


def _undo_chumpy(x):
    """chumpy array -> numpy (batch_smpl.py:22-23)."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "r"):
        return np.asarray(x.r)
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray())
    return np.asarray(x)


class _ChumpyStub:
    """Unpickles chumpy objects without chumpy installed.

    chumpy.Ch pickles its ``__dict__``; the wrapped ndarray lives under
    ``x`` (sometimes ``_data``). We only need the raw array.
    """

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})

    @property
    def r(self):
        for key in ("x", "_data", "a"):
            val = self.__dict__.get(key)
            if isinstance(val, np.ndarray):
                return val
            if val is not None and hasattr(val, "r"):
                return val.r
        raise ValueError("Cannot extract array from chumpy stub")

    @property
    def shape(self):  # chumpy.Ch exposes the wrapped array's shape
        return self.r.shape


class _SmplUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyStub
        return super().find_class(module, name)


def convert_smpl_pkl(pkl_path: str, npz_path: str) -> None:
    """One-time conversion of the original SMPL pickle to a plain npz.

    Replaces the runtime chumpy/pickle dependency of the reference
    (batch_smpl.py:32-33); afterwards ``load_smpl_model`` reads pure numpy.
    """
    with open(pkl_path, "rb") as f:
        dd = _SmplUnpickler(f, encoding="latin1").load()

    num_betas = dd["shapedirs"].shape[-1]
    out = dict(
        v_template=_undo_chumpy(dd["v_template"]).astype(np.float32),
        shapedirs=_undo_chumpy(dd["shapedirs"])
        .reshape(-1, num_betas).T.astype(np.float32),
        posedirs=_undo_chumpy(dd["posedirs"])
        .reshape(-1, NUM_POSE_BASIS).T.astype(np.float32),
        j_regressor=np.asarray(
            _undo_chumpy(dd["J_regressor"]).T, dtype=np.float32
        ),
        lbs_weights=_undo_chumpy(dd["weights"]).astype(np.float32),
        cocoplus_regressor=np.asarray(
            _undo_chumpy(dd["cocoplus_regressor"]).T, dtype=np.float32
        ),
        parents=np.asarray(dd["kintree_table"][0], dtype=np.int64),
        faces=np.asarray(dd["f"], dtype=np.int32) if "f" in dd else None,
    )
    np.savez(npz_path, **{k: v for k, v in out.items() if v is not None})


def load_smpl_model(
    path: str, joint_type: str = "cocoplus", dtype=jnp.float32
) -> SmplModel:
    """Load an SmplModel from an npz produced by ``convert_smpl_pkl`` (or
    directly from the original pkl, converting in-memory)."""
    if path.endswith(".pkl"):
        import tempfile, os

        with tempfile.TemporaryDirectory() as tmp:
            npz = os.path.join(tmp, "smpl.npz")
            convert_smpl_pkl(path, npz)
            return load_smpl_model(npz, joint_type, dtype)

    dd = np.load(path, allow_pickle=False)
    parents = dd["parents"].astype(np.int64)
    parents = tuple(int(p) if p < len(parents) else -1 for p in parents)
    model = SmplModel(
        v_template=jnp.asarray(dd["v_template"], dtype),
        shapedirs=jnp.asarray(dd["shapedirs"], dtype),
        posedirs=jnp.asarray(dd["posedirs"], dtype),
        j_regressor=jnp.asarray(dd["j_regressor"], dtype),
        lbs_weights=jnp.asarray(dd["lbs_weights"], dtype),
        joint_regressor=jnp.asarray(dd["cocoplus_regressor"], dtype),
        parents=parents,
        faces=dd["faces"] if "faces" in dd else None,
    )
    return model.with_joint_type(joint_type)


def synthetic_smpl_model(
    num_verts: int = 256,
    num_kps: int = 19,
    seed: int = 0,
    dtype=jnp.float32,
) -> SmplModel:
    """Deterministic random SMPL-shaped model for tests and benchmarks.

    Uses the real SMPL kinematic tree and dimensional contract, with a
    reduced vertex count so golden-value tests stay fast on CPU.
    """
    rng = np.random.RandomState(seed)
    v = num_verts
    v_template = rng.uniform(-1, 1, (v, 3)).astype(np.float32)
    shapedirs = (rng.randn(10, v * 3) * 0.03).astype(np.float32)
    posedirs = (rng.randn(NUM_POSE_BASIS, v * 3) * 0.01).astype(np.float32)

    j_reg = rng.rand(v, NUM_JOINTS).astype(np.float32) ** 8
    j_reg /= j_reg.sum(axis=0, keepdims=True)
    w = rng.rand(v, NUM_JOINTS).astype(np.float32) ** 4
    w /= w.sum(axis=1, keepdims=True)
    joint_reg = rng.rand(v, num_kps).astype(np.float32)
    joint_reg /= joint_reg.sum(axis=0, keepdims=True)

    faces = rng.randint(0, v, (2 * v, 3)).astype(np.int32)

    return SmplModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_reg, dtype),
        lbs_weights=jnp.asarray(w, dtype),
        joint_regressor=jnp.asarray(joint_reg, dtype),
        parents=SMPL_PARENTS,
        faces=faces,
    )
