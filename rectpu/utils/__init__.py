from rectpu.utils.logging import configure, fmt_floats, fmt_metrics, get_logger

__all__ = ["configure", "fmt_floats", "fmt_metrics", "get_logger"]
