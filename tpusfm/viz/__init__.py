from tpusfm.viz.ply import write_ply
from tpusfm.viz.draw import draw_matches, draw_keypoints
