from mirage_tpu.train.schedules import cosine_scheduler, adjust_learning_rate  # noqa: F401
from mirage_tpu.train.optim import create_optimizer, OptimizerConfig  # noqa: F401
