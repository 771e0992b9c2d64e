from .model_zoo import ModelZooUrls, get, get_checkpoint_url, get_config_file

__all__ = ["ModelZooUrls", "get", "get_checkpoint_url", "get_config_file"]
