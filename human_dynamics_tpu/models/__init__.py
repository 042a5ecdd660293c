from human_dynamics_tpu.models.resnet import ResNetV2_50
from human_dynamics_tpu.models.temporal import TemporalEncoderFC2GN
from human_dynamics_tpu.models.ief import IefRegressor, ief_refine
from human_dynamics_tpu.models.hallucinator import Hallucinator
from human_dynamics_tpu.models.discriminator import PoseDiscriminator
from human_dynamics_tpu.models.hmmr import HmmrModel, HmmrOutputs
