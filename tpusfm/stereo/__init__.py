from tpusfm.stereo.block_matching import stereo_bm
from tpusfm.stereo.disparity import match_disparity_image, disparity_rms
from tpusfm.stereo.filters import box_filter, median_blur, dilate
from tpusfm.stereo.portrait import create_portrait_mode
