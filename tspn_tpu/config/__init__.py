from tspn_tpu.config.config import Config, get_default_config, cfg  # noqa: F401
