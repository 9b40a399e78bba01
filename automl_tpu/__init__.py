"""automl_tpu: a TPU-native JAX/XLA/Pallas framework with the capabilities of google/automl.

Subpackages:
  config    -- dot-dict Config with override-string / YAML layering (ref: efficientdet/hparams_config.py)
  nn        -- minimal functional module system + layers (conv/BN/SE/...)
  models    -- EfficientNet V1/V2, EfficientDet (BiFPN + heads), decoder-only LM
  ops       -- anchors, on-device NMS, IoU/focal losses, postprocess, attention kernels
  parallel  -- device mesh + sharding configs (GSPMD over named mesh axes)
  train     -- optimizers (SGD/RMSProp/Adam/Lion), LR schedules, EMA, train steps
  data      -- host-side input pipeline + device-side augmentation
  inference -- serving drivers, export, benchmark harness
"""

__version__ = "0.1.0"

# Import named-config registrations so `config.lookup('efficientnetv2-s')`
# works right after `import automl_tpu`.
from automl_tpu import configs as _configs  # noqa: E402,F401
