from .kg_stream import stream_kg_triples, stream_mentions  # noqa: F401
