from mirage_tpu.models.mirage import (  # noqa: F401
    MIRAGEModel,
    add_model,
    model_factory,
    miragepre_base,
    miragepre_large,
    miragelight_base,
    miragelight_large,
)
