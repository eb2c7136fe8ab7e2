from tpusfm.dist.mesh import make_mesh, device_count
from tpusfm.dist.sharded_ba import sharded_bundle_adjust
from tpusfm.dist.ring_match import ring_nn_search
from tpusfm.dist.pair_parallel import parallel_pair_match
