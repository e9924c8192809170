from .torch_import import convert_state_dict, load_pth, import_network

__all__ = ["convert_state_dict", "load_pth", "import_network"]
