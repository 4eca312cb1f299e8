from daft_exprt_tpu.text.cleaners import english_cleaners, text_cleaner

__all__ = ["english_cleaners", "text_cleaner"]
