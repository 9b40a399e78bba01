from automl_tpu.nn.module import (  # noqa: F401
    Module, scope, current_path, run_and_collect_state, record_state,
    record_state_abs, apply_state_updates, split_key, is_batch_stat,
    trainable_mask, rng_scope, make_rng, has_rng,
)
from automl_tpu.nn.precision import Policy, DEFAULT_POLICY, get_policy, set_policy  # noqa: F401
from automl_tpu.nn.quant import (  # noqa: F401
    enable_qat, disable_qat, qat_enabled, qat_scope, fake_quant,
)
from automl_tpu.nn import layers  # noqa: F401
