"""Dataset sources and sinks."""
