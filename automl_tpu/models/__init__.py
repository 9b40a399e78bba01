from automl_tpu.models.efficientnet import (  # noqa: F401
    BlockArgs, decode_block_strings, round_filters, round_repeats,
    EfficientNet, build_model,
)
