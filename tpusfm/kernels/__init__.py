from tpusfm.kernels.distance import nn_search, nn_search_xla, nn_search_pallas
