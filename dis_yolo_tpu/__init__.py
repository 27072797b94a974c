"""dis_yolo_tpu: TPU-native (JAX/Flax/XLA/Pallas) DIS-YOLO framework.

Instance-level segmentation of concrete surface defects (crack / spalling /
exposed rebar): YOLOv3 detector + position-sensitive score-map mask subnet,
re-designed TPU-first from the reference TF1 research code.
"""

from dis_yolo_tpu.config import DEFAULT_CONFIG, DISYoloConfig

__version__ = "0.1.0"
__all__ = ["DISYoloConfig", "DEFAULT_CONFIG", "__version__"]
