from .loader import load_config, save_config, register_parser  # noqa: F401
