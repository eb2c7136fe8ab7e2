from tpusfm.features.sift import sift_detect_and_compute
from tpusfm.features.orb import orb_detect_and_compute
from tpusfm.features.dense import dense_sift_descriptors
