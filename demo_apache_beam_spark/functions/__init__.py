from .sinks import write_text, write_windowed_text, write_table  # noqa: F401
