from .kg_stream import stream_kg_triples, stream_mentions  # noqa: F401
from .rml_stream import convert_stream  # noqa: F401
