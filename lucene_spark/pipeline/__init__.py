from . import dedup, eventops, multimodal, sampling, simsearch, textstats  # noqa: F401
