from colmap_tpu.math import polynomial
