from colmap_tpu.sensor import models
from colmap_tpu.sensor.models import CameraModelId
