from .config import Config, load_config, merge_cfg_options, build_model_config
