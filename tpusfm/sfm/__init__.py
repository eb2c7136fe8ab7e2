from tpusfm.sfm.two_view import two_view_sfm, match_features, TwoViewResult
