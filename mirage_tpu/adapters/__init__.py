from mirage_tpu.adapters.input_adapters import (  # noqa: F401
    PatchedInputAdapter,
    SemSegInputAdapter,
)
from mirage_tpu.adapters.spatial_output import SpatialOutputAdapter  # noqa: F401
from mirage_tpu.adapters.seg_heads import (  # noqa: F401
    ConvNeXtAdapter,
    DPTOutputAdapter,
    LinearSegAdapter,
    SegmenterMaskTransformerAdapter,
)
