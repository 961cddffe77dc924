"""Pure functional ops (jnp only, explicit PRNG keys, static shapes).

One canonical implementation per op. The reference duplicates most of these
across files (see SURVEY.md §2 duplication map); here each exists exactly once
and is used by every higher layer.
"""

from nerf_fewshot_tpu.ops.encoding import positional_encoding, posenc_output_dim
from nerf_fewshot_tpu.ops.rays import get_rays, project_points_to_image
from nerf_fewshot_tpu.ops.sampling import (
    sample_along_rays,
    sample_pdf,
    hierarchical_sample,
)
from nerf_fewshot_tpu.ops.composite import (
    compute_weights,
    composite_rays,
    volume_render,
)
from nerf_fewshot_tpu.ops.interp import grid_sample, resize_bilinear

__all__ = [
    "positional_encoding",
    "posenc_output_dim",
    "get_rays",
    "project_points_to_image",
    "sample_along_rays",
    "sample_pdf",
    "hierarchical_sample",
    "compute_weights",
    "composite_rays",
    "volume_render",
    "grid_sample",
    "resize_bilinear",
]
