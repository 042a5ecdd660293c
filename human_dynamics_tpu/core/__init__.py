from human_dynamics_tpu.core.rotations import (
    skew_symmetric,
    rodrigues,
    rot_to_axis_angle,
    rotation_deltas,
    lrotmin,
)
from human_dynamics_tpu.core.smpl import (
    SmplModel,
    load_smpl_model,
    convert_smpl_pkl,
    synthetic_smpl_model,
    smpl_forward,
)
from human_dynamics_tpu.core.projection import (
    orth_proj_idrot,
    procrustes2d_vis,
    orth_proj_optcam,
)
