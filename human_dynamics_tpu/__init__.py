"""human_dynamics_tpu: a TPU-native (JAX/XLA/Pallas) framework for 3D human
dynamics from video, with the capabilities of akanazawa/human_dynamics (HMMR).

Layout (mirrors SURVEY.md layer map; citations in docstrings point into the
reference repo at /root/reference for behavioral parity checking):

- core/      SMPL body model, rotation kernels, camera projection.
- models/    ResNet-50v2 feature encoder, AZ_FC2GN temporal encoder, IEF
             regressor + delta heads, hallucinator, pose discriminator.
- ops/       Pallas TPU kernels for the hot paths (fused LBS skinning).
- parallel/  Device mesh helpers, DP sharding, temporal halo exchange.
- train/     Loss library, two-optimizer GAN train step, trainer loop.
- data/      TFRecord IO (pure python), temporal example schema, tube
             augmentation, input pipeline.
- infer/     Sliding-window predictor, track/bbox preprocessing, demo driver.
- eval/      Metric library and evaluation harness.
- viz/       Mesh rasterizer, skeleton drawing, video assembly.
- utils/     Config, checkpointing, logging.
"""

__version__ = "0.1.0"
