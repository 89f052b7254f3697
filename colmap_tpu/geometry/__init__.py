from colmap_tpu.geometry import rotation
from colmap_tpu.geometry import rigid3
from colmap_tpu.geometry import sim3
from colmap_tpu.geometry import triangulation
from colmap_tpu.geometry import essential
from colmap_tpu.geometry import homography
from colmap_tpu.geometry import gps
