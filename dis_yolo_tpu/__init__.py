"""dis_yolo_tpu: TPU-native (JAX/Flax/XLA/Pallas) DIS-YOLO framework.

Instance-level segmentation of concrete surface defects (crack / spalling /
exposed rebar): YOLOv3 detector + position-sensitive score-map mask subnet,
re-designed TPU-first from the reference TF1 research code.

Typical usage:

    from dis_yolo_tpu import DISYoloConfig
    from dis_yolo_tpu.models import api

    cfg = DISYoloConfig()
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    detections, masks = api.predict(model, variables, images, windows)

Training: ``dis_yolo_tpu.train.solver.Solver`` or the CLI
(``python -m dis_yolo_tpu.cli train ...``).
"""

from dis_yolo_tpu.config import DEFAULT_CONFIG, DISYoloConfig

__version__ = "0.1.0"
__all__ = ["DISYoloConfig", "DEFAULT_CONFIG", "__version__"]
