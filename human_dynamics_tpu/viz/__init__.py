from human_dynamics_tpu.viz.renderer import VisRenderer
from human_dynamics_tpu.viz.skeleton import draw_skeleton, draw_text
from human_dynamics_tpu.viz.video import make_video
