from rectpu.utils.logging import get_logger, float_array_string

__all__ = ["get_logger", "float_array_string"]
