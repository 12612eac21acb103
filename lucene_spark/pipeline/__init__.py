from . import dedup, eventops, multimodal, simsearch, textstats  # noqa: F401
