"""Data-parallel wrapper for the fused train-step kernel.

``jax.jit`` sharding annotations cannot partition a ``pallas_call`` (no SPMD
rule), so the multi-chip fast path uses ``shard_map``: each device runs the
fused kernel on its ray shard, then loss and gradients are ``psum``ed over
ICI. Global masked-mean exactness: the per-shard kernel normalizes by the
*global* valid-ray count (psum of the local mask sums), so the psum of
shard losses/gradients equals the single-device result bit-for-bit modulo
reduction order (pinned by tests/test_fused_dp.py on the 8-CPU-device mesh,
kernel in interpret mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nerf_fewshot_tpu.render.pipeline import RenderSettings
from nerf_fewshot_tpu.render.train_kernel import fused_train_loss_grad


def make_dp_fused_loss_grad(
    mesh: Mesh,
    settings: RenderSettings,
    pos_freq: int,
    dir_freq: int,
    num_layers: int,
    hidden_dim: int,
    use_viewdirs: bool = True,
    lora_alpha: float = 16.0,
    interpret: bool = False,
    compute_dtype: str = "float32",
    axis_name: str = "data",
    point_features_builder=None,
    reg_weight: float = 0.0,
):
    """Build ``(params, key, rays_o, rays_d, target, mask) -> (loss, grads)``
    with the ray batch sharded over ``mesh`` and replicated outputs.

    ``point_features_builder``: optional ``(feat_map, feat_pose) -> (pts ->
    features)`` factory for per-point DINO conditioning (reference hot loop:
    train.py:210-221). When given, the returned callable takes two extra
    REPLICATED trailing args ``(feat_map, feat_pose)``; the feature sampling
    itself (projection + dense-matmul grid_sample, ops/interp.py) runs as an
    XLA prologue on each device's local ray shard before the kernel — the
    feature map is a per-view constant, so replication is the right sharding
    and no collective is needed for it."""

    def local_fn(params, key, rays_o, rays_d, target, mask, *feat):
        denom = jax.lax.psum(jnp.sum(mask), axis_name)
        # Decorrelate per-shard stratified jitter.
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        pf = None
        if point_features_builder is not None:
            feat_map, feat_pose = feat
            pf = point_features_builder(feat_map, feat_pose)
        loss, grads = fused_train_loss_grad(
            params, rays_o, rays_d, target, mask, settings,
            pos_freq, dir_freq, num_layers, hidden_dim,
            use_viewdirs=use_viewdirs, lora_alpha=lora_alpha, key=key,
            interpret=interpret, compute_dtype=compute_dtype,
            denom_rays=denom, point_features_fn=pf,
            reg_weight=reg_weight,
        )
        loss = jax.lax.psum(loss, axis_name)
        grads = jax.lax.psum(grads, axis_name)
        return loss, grads

    in_specs = (P(), P(), P(axis_name), P(axis_name), P(axis_name),
                P(axis_name))
    if point_features_builder is not None:
        in_specs = in_specs + (P(), P())  # feat_map, feat_pose replicated
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        # pallas_call out_shapes carry no varying-mesh-axes metadata
        check_vma=False,
    )
