from tpusfm.io.image import imread, imread_gray, imwrite, to_gray, resize, rotate
from tpusfm.io.dataset import REFERENCE_ROOT, source_image, calibration_images
