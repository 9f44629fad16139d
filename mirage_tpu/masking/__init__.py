from mirage_tpu.masking.masking import (  # noqa: F401
    generate_random_masks,
    masks_to_indices,
    sample_alphas,
)
