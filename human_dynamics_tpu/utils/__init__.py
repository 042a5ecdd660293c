from human_dynamics_tpu.utils.config import Config
