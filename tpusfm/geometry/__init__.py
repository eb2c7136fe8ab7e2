from tpusfm.geometry.projection import rodrigues, rodrigues_inv, project_points, distort
from tpusfm.geometry.undistort import undistort_points
from tpusfm.geometry.triangulate import triangulate_dlt, triangulate_pair
from tpusfm.geometry.epipolar import find_essential_ransac, sampson_error
from tpusfm.geometry.pose import recover_pose
from tpusfm.geometry.pnp import pnp_ransac
