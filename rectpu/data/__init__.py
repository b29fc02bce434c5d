from rectpu.data.ml_100k import download_data, load_data, process_data, save_data
from rectpu.data.synthetic import generate_frame, write_synthetic_dataset

__all__ = [
    "download_data",
    "load_data",
    "process_data",
    "save_data",
    "generate_frame",
    "write_synthetic_dataset",
]
