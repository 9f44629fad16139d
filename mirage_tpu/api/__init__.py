from mirage_tpu.api.wrapper import MIRAGEWrapper  # noqa: F401
