from mirage_tpu.utils.factory import get_factory_adder  # noqa: F401
