from rectpu.ops.embedding import embedding_lookup, lookup_onehot, lookup_pallas, lookup_take
from rectpu.ops.fm import fm_cross, fm_cross_pallas, fm_cross_xla

__all__ = [
    "embedding_lookup",
    "lookup_take",
    "lookup_onehot",
    "lookup_pallas",
    "fm_cross",
    "fm_cross_xla",
    "fm_cross_pallas",
]
