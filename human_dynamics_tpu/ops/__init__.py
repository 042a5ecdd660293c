from human_dynamics_tpu.ops.smpl_pallas import (
    FusedSmplConstants,
    prepare_fused_constants,
    smpl_forward_fused,
)
