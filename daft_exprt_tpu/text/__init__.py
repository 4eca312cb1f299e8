from daft_exprt_tpu.text.cleaners import normalize_english, text_cleaner

__all__ = ["normalize_english", "text_cleaner"]
