from tpusfm.calib.chessboard import find_chessboard_corners
from tpusfm.calib.zhang import calibrate_camera
