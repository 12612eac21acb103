from .nrt import StreamingIndexWriter, index_stream

__all__ = ["StreamingIndexWriter", "index_stream"]
