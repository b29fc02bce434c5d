from rectpu.serve.export import ServingModel, export_model, latest_export, load_model, make_exporter

__all__ = ["ServingModel", "export_model", "latest_export", "load_model", "make_exporter"]
