from tpusfm.match.bf import bf_match
from tpusfm.match.gms import gms_filter
from tpusfm.match.kmeans import kmeans
from tpusfm.match.logos import logos_match
