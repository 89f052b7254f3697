from colmap_tpu.scene.reconstruction import Camera, Image, Point3D, Reconstruction
