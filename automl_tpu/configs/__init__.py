from automl_tpu.configs import effnet_configs  # noqa: F401
