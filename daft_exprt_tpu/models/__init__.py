from daft_exprt_tpu.models.daft_exprt import DaftExprt

__all__ = ["DaftExprt"]
