from mirage_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_spec,
    param_specs,
    shard_params,
)
