from rectpu.models.autoint import AutoIntModel
from rectpu.models.base import TowerConfig
from rectpu.models.dcn import DCNModel
from rectpu.models.deep_fm import DeepFMModel
from rectpu.models.dlrm import DLRMModel
from rectpu.models.dnn import DNNModel
from rectpu.models.linear import LinearModel
from rectpu.models.wide_deep import WideDeepModel
from rectpu.models.xdeep_fm import XDeepFMModel

MODEL_REGISTRY = {
    "linear": LinearModel,
    "deep": DNNModel,
    "linear_deep": WideDeepModel,
    "deep_fm": DeepFMModel,
    "dlrm": DLRMModel,
    "dcn": DCNModel,
    "xdeep_fm": XDeepFMModel,
    "autoint": AutoIntModel,
}

__all__ = [
    "TowerConfig",
    "LinearModel",
    "DNNModel",
    "WideDeepModel",
    "DeepFMModel",
    "DLRMModel",
    "DCNModel",
    "XDeepFMModel",
    "AutoIntModel",
    "MODEL_REGISTRY",
]
