from colmap_tpu.optim.ransac import RansacOptions, ransac
