from tpusfm.utils.pad import round_up, pad_axis, pad_to_multiple
from tpusfm.utils.timing import Timer, stage_times
