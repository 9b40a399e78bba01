from automl_tpu.train import optimizers, schedules  # noqa: F401
