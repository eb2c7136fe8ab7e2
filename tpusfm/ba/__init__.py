from tpusfm.ba.tracks import build_tracks, Observations
from tpusfm.ba.solver import bundle_adjust
from tpusfm.ba.multiview import incremental_sfm
