from rectpu.io.loader import CsvDataset, DataState, read_csv_columns

__all__ = ["CsvDataset", "DataState", "read_csv_columns"]
